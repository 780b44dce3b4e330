import pytest

from udal_tpu.config import (Config, default_detection_configs, get_feat_sizes,
                             get_detection_config, parse_image_size)


def test_override_from_string():
    c = get_detection_config("efficientdet-d0")
    c.override("num_classes=8,learning_rate=2*0.04,image_size=1024x512")
    assert c.num_classes == 8
    assert c.learning_rate == pytest.approx(0.08)
    assert c.image_size == "1024x512"
    assert parse_image_size(c.image_size) == (512, 1024)


def test_override_nested_and_unknown_key():
    c = get_detection_config("efficientdet-d0")
    c.override({"nms_configs": {"method": "hard"}})
    assert c.nms_configs["method"] == "hard"
    with pytest.raises(KeyError):
        c.override("not_a_real_key=1")
    c.override({"brand_new": 3}, allow_new_keys=True)
    assert c.brand_new == 3


def test_model_scaling_table():
    d0 = get_detection_config("efficientdet-d0")
    assert d0.backbone_name == "efficientnet-b0"
    assert d0.fpn_num_filters == 64
    assert d0.image_size == 512
    d7x = get_detection_config("efficientdet-d7x")
    assert d7x.max_level == 8
    assert d7x.fpn_weight_method == "sum"
    lite0 = get_detection_config("efficientdet-lite0")
    assert lite0.act_type == "relu6"
    assert lite0.mean_rgb == 127.0


def test_feat_sizes_odd_input():
    fs = get_feat_sizes((513, 1025), 7)
    assert fs[0] == {"height": 513, "width": 1025}
    assert fs[1] == {"height": 257, "width": 513}
    assert fs[7] == {"height": 5, "width": 9}


def test_yaml_roundtrip(tmp_path):
    c = get_detection_config("efficientdet-d0")
    c.num_classes = 8
    p = tmp_path / "cfg.yaml"
    c.save_to_yaml(str(p))
    c2 = get_detection_config("efficientdet-d0")
    c2.override(str(p))
    assert c2.num_classes == 8
    assert c2.as_dict() == c.as_dict()


def test_defaults_parity_with_reference():
    from tests.reference_util import import_reference
    ref = import_reference("hparams_config")
    ref_cfg = ref.default_detection_configs().as_dict()
    ours = default_detection_configs().as_dict()
    # Keys the reference stores relative to its own repo layout.
    path_like = {"albumentations_path"}
    missing = set(ref_cfg) - set(ours)
    assert not missing, f"missing default keys: {missing}"
    for k, v in ref_cfg.items():
        if k in path_like:
            continue
        assert ours[k] == v, f"default mismatch for {k}: {ours[k]!r} != {v!r}"


@pytest.mark.parametrize("name", ["efficientdet-d0", "efficientdet-d3",
                                  "efficientdet-d7x", "efficientdet-lite2"])
def test_model_table_parity_with_reference(name):
    from tests.reference_util import import_reference
    ref = import_reference("hparams_config")
    ref_cfg = ref.get_efficientdet_config(name).as_dict()
    ours = get_detection_config(name).as_dict()
    for k in ("backbone_name", "image_size", "fpn_num_filters", "fpn_cell_repeats",
              "box_class_repeats", "anchor_scale", "max_level", "fpn_weight_method",
              "act_type", "mean_rgb", "stddev_rgb"):
        assert ours[k] == ref_cfg[k], f"{name}.{k}: {ours[k]!r} != {ref_cfg[k]!r}"


def test_all_shipped_train_yamls_load():
    """Every yaml under configs/train/ overrides cleanly onto d0 defaults."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "configs", "train")
    paths = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert paths
    for p in paths:
        c = get_detection_config("efficientdet-d0")
        c.override(p)   # raises KeyError on any unknown key


def test_stable_variants_differ_only_in_beta_nll():
    """The *_stable.yaml configs are their parity twin + la_beta_nll=1.0
    (docs/COLLAPSE_ROOTCAUSE.md)."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "configs", "train")
    stables = sorted(glob.glob(os.path.join(root, "*_stable.yaml")))
    assert stables, "stable config variants missing"
    for p in stables:
        twin = p.replace("_stable.yaml", ".yaml")
        assert os.path.exists(twin), twin
        c_stable = get_detection_config("efficientdet-d0")
        c_stable.override(p)
        c_twin = get_detection_config("efficientdet-d0")
        c_twin.override(twin)
        ds, dt = c_stable.as_dict(), c_twin.as_dict()
        assert ds.pop("la_beta_nll") == 1.0
        assert dt.pop("la_beta_nll") == 0.0
        assert ds == dt
