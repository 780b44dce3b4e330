import numpy as np
import pytest

from udal_tpu.apps import active_learning as al


def _rows(n_images=20, dets_per_image=3, seed=0, uncertain_images=None):
    """Synthetic prediction rows; `uncertain_images` get high uncertainty."""
    rng = np.random.RandomState(seed)
    uncertain_images = set(uncertain_images or [])
    rows = []
    for i in range(n_images):
        name = f"img{i:03d}.png"
        boost = 5.0 if name in uncertain_images else 1.0
        for _ in range(dets_per_image):
            box = [10.0, 10.0, 60.0, 80.0]
            rows.append({
                "image_name": name,
                "det_score": float(rng.uniform(0.3, 1.0)),
                "bbox": box,
                "class": float(rng.randint(1, 4)),
                "entropy": float(rng.gamma(2, 0.2) * boost),
                "uncalib_albox": list(rng.gamma(2, 0.5, 4) * boost),
                "uncalib_mcbox": list(rng.gamma(2, 0.5, 4) * boost),
                "uncalib_mcclass": list(rng.gamma(2, 0.2, 3) * boost),
            })
    return rows


def test_entropy_strategy_selects_uncertain():
    target = {"img003.png", "img007.png", "img011.png"}
    rows = _rows(uncertain_images=target)
    picked = al.select_images(rows, "entropy", 3)
    assert set(picked) == target


def test_bottomk_selects_certain():
    target = {"img003.png"}
    rows = _rows(uncertain_images=target)
    picked = al.select_images(rows, "bottomk_entropy", 5)
    assert "img003.png" not in picked


def test_alluncert_and_sota_and_highep():
    rows = _rows(uncertain_images={"img001.png", "img002.png"})
    for strat in ("alluncert_mean", "sota_max", "highep_lowal"):
        picked = al.select_images(rows, strat, 2)
        assert len(picked) == 2


def test_nee_binned_selection():
    rows = _rows(n_images=25)
    picked = al.select_images(rows, "nee_entropy", 10)
    assert len(picked) == 10
    assert len(set(picked)) == 10


def test_perc_class_balancing_runs():
    rows = _rows()
    picked = al.select_images(rows, "perc_entropy", 4)
    assert len(picked) == 4


def test_random_strategy_seeded():
    rows = _rows()
    a = al.select_images(rows, "random", 5, rng=np.random.RandomState(3))
    b = al.select_images(rows, "random", 5, rng=np.random.RandomState(3))
    assert a == b


def test_phash_whash_duplicates():
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (64, 96, 3), np.uint8)
    near = base.copy()
    near[:4] = 0  # small perturbation
    different = rng.randint(0, 255, (64, 96, 3), np.uint8)
    for fn in (al.phash, al.whash):
        h0, h1, h2 = fn(base), fn(near), fn(different)
        assert al.hamming(h0, h1) < al.hamming(h0, h2)
    kept = al.prune_pool([base, near, different], max_distance=10)
    assert 0 in kept and 2 in kept and 1 not in kept


def test_loop_orchestration(tmp_path):
    pool = [f"img{i:03d}.png" for i in range(20)]
    uncertain = {"img015.png", "img016.png", "img017.png"}
    trained = []

    def infer_fn(remaining, it_dir):
        return [r for r in _rows(20, uncertain_images=uncertain)
                if r["image_name"] in set(remaining)]

    def train_fn(selected, it_dir):
        trained.append(list(selected))

    loop = al.ActiveLearning(pool, str(tmp_path), "entropy",
                             budget_steps=[10, 10, 10],
                             train_fn=train_fn, infer_fn=infer_fn, seed=0)
    selected = loop.run()
    assert len(selected) == 6
    assert len(trained) == 3
    # after the random warm-start, uncertain images get picked
    assert uncertain & set(selected)
    assert (tmp_path / "iter_2" / "selected.txt").exists()
