import os

from rdfc_gan_tpu.config import Config, default_config, dump_config, load_config


def test_default_has_reference_cli_surface():
    cfg = default_config()
    # reference CLI contract (RDFC-GAN/config.py)
    for k in ["dataset", "batch_size", "lr", "beta1", "beta2", "n_epochs",
              "decay_epoch", "gan_loss_type", "lambda_A", "lambda_B",
              "lambda_L1", "label_wall", "label_floor", "label_ceiling",
              "criterion_to_get_best_ckpt", "seed"]:
        assert k in cfg, k
    assert cfg.lr == 2e-3 and cfg.beta1 == 0.5 and cfg.n_epochs == 150


def test_yaml_then_cli_merge(tmp_path):
    cfg = default_config()
    yaml_path = tmp_path / "model.yaml"
    yaml_path.write_text(
        "model:\n  type: RDFCGAN\n  G_A2B:\n    type: RDFGenerator\n"
        "lr: 0.001\n"
    )
    load_config(cfg, str(yaml_path))
    assert cfg.model.type == "RDFCGAN"
    assert cfg.model.G_A2B.type == "RDFGenerator"
    assert cfg.lr == 0.001
    # CLI overrides win last
    load_config(cfg, {"lr": 0.0005, "batch_size": 8})
    assert cfg.lr == 0.0005 and cfg.batch_size == 8


def test_freeze_and_dump(tmp_path):
    cfg = default_config()
    cfg.merge({"model": {"type": "RDFGAN"}})
    cfg.freeze()
    try:
        cfg.lr = 1.0
        raised = False
    except AttributeError:
        raised = True
    assert raised
    cfg.defrost()
    out = tmp_path / "config.yaml"
    dump_config(cfg, str(out))
    assert os.path.exists(out)
    cfg2 = load_config(Config(), str(out))
    assert cfg2.model.type == "RDFGAN"
