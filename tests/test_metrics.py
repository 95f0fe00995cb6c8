import jax.numpy as jnp
import numpy as np

from rdfc_gan_tpu.metrics import METRIC_NAMES, RDFGANMetric, compute_depth_metrics


def _hand_metrics(gt, pred, t_valid=1e-4):
    """Hand-computed oracle per the reference protocol (rdf_gan_metric.py)."""
    mask = gt > t_valid
    n = mask.sum()
    p, g = pred[mask], gt[mask]
    diff = p - g
    rmse = np.sqrt((diff**2).sum() / (n + 1e-8))
    mae = np.abs(diff).sum() / (n + 1e-8)
    pinv = np.where(p > t_valid, 1.0 / (p + 1e-8), 0.0)
    ginv = 1.0 / (g + 1e-8)
    dinv = pinv - ginv
    irmse = np.sqrt((dinv**2).sum() / (n + 1e-8))
    imae = np.abs(dinv).sum() / (n + 1e-8)
    rel = (np.abs(diff) / (g + 1e-8)).sum() / (n + 1e-8)
    ratio = np.maximum(g / (p + 1e-8), p / (g + 1e-8))
    d1 = (ratio < 1.25).sum() / (n + 1e-8)
    d2 = (ratio < 1.25**2).sum() / (n + 1e-8)
    d3 = (ratio < 1.25**3).sum() / (n + 1e-8)
    return np.array([rmse, mae, irmse, imae, rel, d1, d2, d3])


def test_compute_depth_metrics_vs_hand(rng):
    gt = rng.uniform(0.5, 10.0, size=(2, 16, 20)).astype(np.float32)
    gt[0, :4] = 0.0  # invalid region
    pred = gt + rng.normal(0, 0.3, size=gt.shape).astype(np.float32)
    pred = np.clip(pred, 0.01, None)

    got = np.asarray(compute_depth_metrics(jnp.asarray(gt), jnp.asarray(pred)))
    for b in range(2):
        want = _hand_metrics(gt[b], pred[b])
        np.testing.assert_allclose(got[b], want, rtol=2e-4, atol=2e-5)


def test_perfect_prediction():
    gt = np.full((1, 8, 8), 3.0, dtype=np.float32)
    m = np.asarray(compute_depth_metrics(jnp.asarray(gt), jnp.asarray(gt)))[0]
    assert m[0] < 1e-5 and m[1] < 1e-5  # RMSE, MAE
    assert abs(m[5] - 1.0) < 1e-5  # delta1 == 1


def test_evaluate_mask_respected():
    gt = np.full((1, 8, 8), 2.0, dtype=np.float32)
    pred = gt.copy()
    pred[0, :4] = 10.0  # break half the image
    em = np.zeros((1, 8, 8), dtype=bool)
    em[0, 4:] = True  # but mask it out of evaluation
    m = np.asarray(
        compute_depth_metrics(jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(em))
    )[0]
    assert m[0] < 1e-5


def test_evaluate_all_api(rng):
    metric = RDFGANMetric()
    results = []
    for _ in range(3):
        gt = rng.uniform(1, 9, size=(16, 20)).astype(np.float32)
        pd_ = gt + rng.normal(0, 0.1, size=gt.shape).astype(np.float32)
        results.append({"gt": gt, "pd": np.clip(pd_, 0.01, None)})
    ret = metric.evaluate_all(results)
    assert set(ret) == set(METRIC_NAMES)
    assert ret["D^1"] <= 1.0 + 1e-6 and ret["RMSE"] > 0
