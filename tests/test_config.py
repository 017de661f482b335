import json

from salient_plusplus_tpu.config import RunConfig


def test_from_args_overrides():
    cfg = RunConfig.from_args([
        "--train_batch_size", "512", "--train_fanouts", "7,5,3",
        "--pipeline_disabled", "true", "--lr", "0.01",
        "--cache_strategy", "degree", "--hbm_fraction", "0.25",
    ])
    assert cfg.train_batch_size == 512
    assert cfg.train_fanouts == [7, 5, 3]
    assert cfg.pipeline_disabled is True
    assert cfg.lr == 0.01
    assert cfg.cache_strategy == "degree"
    assert cfg.hbm_fraction == 0.25
    # untouched defaults survive
    assert cfg.load_balance_scheme == "federated"


def test_from_file_roundtrip(tmp_path):
    cfg = RunConfig(epochs=7, model_name="GAT")
    f = tmp_path / "cfg.json"
    f.write_text(cfg.to_json())
    cfg2 = RunConfig.from_file(str(f))
    assert cfg2 == cfg


def test_file_plus_cli_override(tmp_path):
    f = tmp_path / "cfg.json"
    f.write_text(RunConfig(epochs=7).to_json())
    cfg = RunConfig.from_args(["--config_file", str(f), "--epochs", "9"])
    assert cfg.epochs == 9


def test_invalid_enums_fail_fast():
    """A typo'd mode string must die at config construction, not after a
    full training run (ADVICE r2)."""
    import pytest

    from salient_plusplus_tpu.config import RunConfig

    for field, bad in [("final_test_mode", "layerwize"),
                       ("execution_mode", "sim"),
                       ("computation_mode", "freq"),
                       ("load_balance_scheme", "random"),
                       ("cold_mode", "remote"),
                       ("train_sampler", "NeighborSampler")]:
        with pytest.raises(ValueError):
            RunConfig(**{field: bad})
        with pytest.raises(ValueError):
            RunConfig().replace(**{field: bad})
