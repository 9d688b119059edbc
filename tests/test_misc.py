"""Factory, CSV dataset, config registry, compat importer edge cases."""

import numpy as np
import pytest

from calm_vit_dte_tpu.utils.configs import CONFIGS, get_config


def test_config_registry_complete():
    # The five BASELINE.json target configs (+ reg tiny).
    for name in ("tiny-cls", "tiny-reg", "imagenet-cls-224",
                 "imagenet-reg-224", "imagenet-cls-256", "hires-cls-1024"):
        assert name in CONFIGS
    with pytest.raises(KeyError):
        get_config("nope")


def test_config_overrides():
    cfg = get_config("imagenet-cls-224", global_batch_size=64, epochs=2)
    assert cfg.global_batch_size == 64
    assert cfg.epochs == 2
    assert cfg.model.in_features == 672


def test_all_registered_models_validate():
    for name, cfg in CONFIGS.items():
        cfg.model.validate()


def test_factory_fresh():
    import jax

    from calm_vit_dte_tpu.models.factory import create_vit

    cfg, params, state = create_vit("tiny-cls")
    n = sum(x.size for x in jax.tree.leaves(params))
    assert n == 1_551_602


def test_csv_dataset(tmp_path):
    from PIL import Image

    from calm_vit_dte_tpu.data.csv_dataset import CSVImageDataset

    rng = np.random.default_rng(0)
    (tmp_path / "imgs").mkdir()
    rows = ["idx,file,label"]
    for i in range(10):
        name = f"imgs/{i}.png"
        Image.fromarray(rng.integers(0, 255, (20, 30, 3),
                                     dtype=np.uint8)).save(tmp_path / name)
        rows.append(f"{i},{name},{i % 2}")
    (tmp_path / "data.csv").write_text("\n".join(rows))

    train = CSVImageDataset(str(tmp_path), "data.csv", size=16, train=True)
    val = CSVImageDataset(str(tmp_path), "data.csv", size=16, train=False)
    assert len(train) == 8 and len(val) == 2
    assert train.num_classes == 2
    img, label = train.load(0)
    assert img.shape == (16, 16, 3) and label in (0, 1)
    before = list(train._view())
    train.reshuffle()
    assert list(train._view()) != before or len(before) <= 1


def test_import_rejects_unknown_keys():
    import jax

    from calm_vit_dte_tpu.compat.torch_import import import_torch_state_dict
    from calm_vit_dte_tpu.models.vit import vit_init
    from calm_vit_dte_tpu.utils.configs import TINY_VIT

    params, state = vit_init(TINY_VIT, jax.random.PRNGKey(0))
    with pytest.raises(KeyError):
        import_torch_state_dict(params, state,
                                {"no.such.module.weight_orig":
                                 np.zeros((4, 4), np.float32)})
    with pytest.raises(ValueError):
        import_torch_state_dict(
            params, state,
            {"head.0.weight_orig": np.zeros((4, 4), np.float32)})


def test_torch_export_roundtrip():
    """export -> import reproduces the exact pytrees (both directions of the
    reference-checkpoint migration path)."""
    import jax

    from calm_vit_dte_tpu.compat.torch_export import export_torch_state_dict
    from calm_vit_dte_tpu.compat.torch_import import import_torch_state_dict
    from calm_vit_dte_tpu.models.vit import vit_init
    from calm_vit_dte_tpu.utils.configs import TINY_VIT

    params, state = vit_init(TINY_VIT, jax.random.PRNGKey(7))
    sd = export_torch_state_dict(params, state)
    assert all("." in k for k in sd)
    p2, s2 = vit_init(TINY_VIT, jax.random.PRNGKey(8))  # different init
    p2, s2 = import_torch_state_dict(p2, s2, sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_export_names_match_reference():
    """Exported names are exactly the reference's state-dict keys (checked
    against the committed golden, which recorded the reference's names)."""
    import pathlib

    import jax

    from calm_vit_dte_tpu.compat.torch_export import export_torch_state_dict
    from calm_vit_dte_tpu.models.vit import vit_init
    from calm_vit_dte_tpu.utils.configs import TINY_VIT

    golden = np.load(pathlib.Path(__file__).parent / "golden"
                     / "vit_cls_tiny.npz")
    ref_keys = {k[3:] for k in golden.files if k.startswith("sd/")}
    params, state = vit_init(TINY_VIT, jax.random.PRNGKey(0))
    ours = set(export_torch_state_dict(params, state))
    missing = ref_keys - ours
    extra = ours - ref_keys
    assert not missing, f"missing reference keys: {sorted(missing)[:5]}"
    assert not extra, f"extra keys: {sorted(extra)[:5]}"
