"""AutoAugment v0-v3 policy tables + ops — parity and behavior tests.

Policy-table parity is checked against the actual reference tables
(`/root/reference/src/aug/autoaugment.py:50-153`) when importable.
"""

import numpy as np
import pytest

from udal_tpu.data import autoaugment as aa



@pytest.fixture
def img():
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, (64, 96, 3), np.uint8)


@pytest.fixture
def boxes():
    return np.asarray([[8.0, 10.0, 40.0, 60.0], [20.0, 30.0, 55.0, 90.0]],
                      np.float32)


def test_policy_tables_match_reference():
    # The tables are extracted from the reference source via ast (importing
    # the module would load TF, which conflicts with cv2 in this process).
    import ast

    with open("/root/reference/src/aug/autoaugment.py") as fp:
        tree = ast.parse(fp.read())
    ref_tables = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and \
                node.name.startswith("policy_v"):
            for stmt in node.body:
                if isinstance(stmt, ast.Assign):
                    ref_tables[node.name] = ast.literal_eval(stmt.value)
    for name, ref_name in [("v0", "policy_v0"), ("v1", "policy_v1"),
                           ("v2", "policy_v2"), ("v3", "policy_v3"),
                           ("test", "policy_vtest")]:
        ours = [[tuple(op) for op in sub] for sub in aa.POLICIES[name]]
        theirs = [[tuple(op) for op in sub] for sub in ref_tables[ref_name]]
        assert ours == theirs, f"policy {name} table mismatch"


def test_level_mappings_match_reference_constants():
    # magnitude->arg formulas: spot values (`autoaugment.py:1484-1565`)
    assert aa._enhance_level(10) == pytest.approx(1.9)
    assert aa._enhance_level(0) == pytest.approx(0.1)
    assert int(10 / aa.MAX_LEVEL * 4) == 4          # Posterize
    assert int(4 / aa.MAX_LEVEL * 110) == 44        # SolarizeAdd
    assert aa.CUTOUT_CONST == 100 and aa.TRANSLATE_CONST == 250
    assert aa.CUTOUT_BBOX_CONST == 50 and aa.TRANSLATE_BBOX_CONST == 120
    assert aa.CUTOUT_MAX_PAD_FRACTION == 0.75


def test_randaug_op_set_matches_reference():
    assert aa.RANDAUG_OPS == [
        "Equalize", "Solarize", "Color", "Cutout", "SolarizeAdd",
        "TranslateX_BBox", "TranslateY_BBox", "ShearX_BBox", "ShearY_BBox",
        "Rotate_BBox"]


@pytest.mark.parametrize("name", [
    "AutoContrast", "Equalize", "Posterize", "Solarize", "SolarizeAdd",
    "Color", "Contrast", "Brightness", "Sharpness", "Cutout", "BBox_Cutout",
    "TranslateX_BBox", "TranslateY_BBox", "ShearX_BBox", "ShearY_BBox",
    "Rotate_BBox", "Flip_Only_BBoxes", "Equalize_Only_BBoxes",
    "Solarize_Only_BBoxes", "Rotate_Only_BBoxes", "ShearX_Only_BBoxes",
    "ShearY_Only_BBoxes", "TranslateX_Only_BBoxes", "TranslateY_Only_BBoxes",
    "Cutout_Only_BBoxes"])
def test_every_op_preserves_shape_and_box_bounds(name, img, boxes):
    rng = np.random.RandomState(3)
    out, bout = aa.apply_op(name, img, boxes, 8.0, rng)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert bout.shape == boxes.shape
    h, w = img.shape[:2]
    assert (bout[:, 0::2] <= h - 1 + 1e-5).all() and (bout[:, 0::2] >= 0).all()
    assert (bout[:, 1::2] <= w - 1 + 1e-5).all() and (bout[:, 1::2] >= 0).all()


def test_translate_moves_boxes_consistently(img, boxes):
    out, bout = aa.translate_bbox(img, boxes, 10, 0)   # +10 px in x
    np.testing.assert_allclose(bout[:, 1], np.minimum(boxes[:, 1] + 10, 95),
                               atol=1e-4)
    # image content shifted: column 20 now holds former column 10
    np.testing.assert_array_equal(out[:, 20], img[:, 10])


def test_cutout_paints_gray(img):
    rng = np.random.RandomState(0)
    out = aa.cutout(img, 10, rng)
    assert (out == 128).any()
    assert out.shape == img.shape


def test_only_bboxes_limits_effect_to_regions(img, boxes):
    rng = np.random.RandomState(1)
    out, _ = aa.apply_op("Solarize_Only_BBoxes", img, boxes, 0.0, rng)
    mask = np.zeros(img.shape[:2], bool)
    for b in boxes:
        mask[int(b[0]):int(b[2]) + 1, int(b[1]):int(b[3]) + 1] = True
    np.testing.assert_array_equal(out[~mask], img[~mask])
    assert (out[mask] != img[mask]).any()


def test_autoaugment_policy_runs_all_tables(img, boxes):
    for name in ("v0", "v1", "v2", "v3", "test"):
        rng = np.random.RandomState(7)
        out, bout = aa.distort_image_with_autoaugment(img, boxes, name, rng)
        assert out.shape == img.shape
        assert bout.shape[1] == 4


def test_weather_bridge_modes(img, boxes, tmp_path):
    import pickle
    rng = np.random.RandomState(2)
    for mode in ("subjective", "random"):
        out, _ = aa.distort_image_with_weather(img, boxes, mode=mode, rng=rng)
        assert out.shape == img.shape and out.dtype == np.uint8
    # optimal mode loads pickled per-dataset params (ref :1772-1776)
    d = tmp_path / "fog"
    d.mkdir()
    with open(d / "fog_opt_params", "wb") as fp:
        pickle.dump([0.5, 0.5], fp)
    out, _ = aa.distort_image_with_weather(
        img, boxes, mode="optimal", available_ops=["fog"],
        save_path=str(tmp_path) + "/", rng=np.random.RandomState(0))
    assert out.shape == img.shape


def test_every_weather_op_runs(img):
    rng = np.random.RandomState(5)
    for op in aa.WEATHER_OPS:
        params = aa.SUBJECTIVE_PARAMS[op]
        out = aa.apply_weather_op(op, img, params, rng)
        assert out.shape == img.shape and out.dtype == np.uint8
