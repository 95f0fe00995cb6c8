"""Driver-contract surface: __graft_entry__ exposes entry/dryrun_multichip
with the expected signatures (execution is covered by the driver itself and
the on-device validation runs)."""

import importlib.util
import inspect
import os


def _load():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_points_exist():
    mod = _load()
    assert callable(mod.entry)
    sig = inspect.signature(mod.dryrun_multichip)
    assert list(sig.parameters) == ["n_devices"]
