"""v1 vanilla-generator driver — the contract of the reference's MISSING
``RDF-GAN/lib/tools/main_vanilla.py`` (invoked by bash/test_nyuv2_Rs2T.sh:4):
the same train/eval/FPS surface as main.py, driving the ``*_vanilla``
generator build (rdf_gan_generator_vanilla.py:294-374).

Thin wrapper: forwards to tools/main_v1.py with --model vanilla.
"""

from __future__ import annotations

import sys

from main_v1 import main as _main  # noqa: E402  (same tools/ dir)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--model" not in argv:
        argv = ["--model", "vanilla"] + argv
    return _main(argv)


if __name__ == "__main__":
    sys.exit(main())
