"""Golden-image regression gate over the CHECK_ME records.

Each golden is per-tile mean statistics of a CHECK_ME record rendered at 64²
(tools/make_goldens.py). A denoiser/tracer regression that blurs, darkens or
shifts the image moves tile means and fails here; bit-level numeric drift
within tolerance passes. Reference mechanism: Tests/*.bin + human inspection
(NRDSample.cpp:1771-1948) — made machine-checkable."""

import glob
import os

import numpy as np
import pytest

from nrdsample_tpu.pipeline import records, replay

_GOLDENS = sorted(glob.glob(os.path.join(replay.GOLDEN_DIR, "*.npz")))


def _ids():
    out = []
    for p in _GOLDENS:
        stem = os.path.basename(p)[:-4]
        scene, _, idx = stem.rpartition("-")
        if not scene or not idx.isdigit():
            continue  # non-record artifacts (e.g. neural_rr_holdout.npz)
        out.append((scene, int(idx)))
    return out


def _bucket_params():
    """Parametrize with an xdist_group per static compile bucket (records.
    static_bucket): under --dist loadgroup all records sharing a RenderConfig
    land on one worker, so each bucket compiles once per suite run."""
    import json

    params = []
    for scene, idx in _ids():
        path = os.path.join(replay.TESTS_DIR, f"{scene}.json")
        with open(path) as f:
            render = json.load(f)[idx].get("render", {})
        group = f"golden:{records.static_bucket(render)}"
        params.append(pytest.param(scene, idx, marks=pytest.mark.xdist_group(group)))
    return params


@pytest.fixture(scope="module")
def contexts():
    return replay.build_contexts({s for s, _ in _ids()})


def test_goldens_exist():
    """Every CHECK_ME record must have a golden (regen: tools/make_goldens.py)."""
    want = {(s, i) for s, idxs in records.CHECK_ME.items() for i in idxs}
    have = set(_ids())
    assert want <= have, f"missing goldens: {want - have}"


@pytest.mark.parametrize("scene_name,index", _bucket_params())
def test_golden_match(contexts, scene_name, index):
    data = np.load(replay.golden_path(scene_name, index))
    res = int(data["res"])
    out, _ = replay.render_record(contexts, scene_name, index, res=res)
    stats = replay.golden_stats(np.asarray(out["color"]), res)

    # tolerance: 2% of the image's dynamic scale per tile — catches any
    # structural change (blur, brightness shift, missing pass), passes tiny
    # numeric drift from op-reordering
    scale = max(float(data["std"]), 0.05)
    np.testing.assert_allclose(
        stats["tile_means"], data["tile_means"], atol=0.02 * scale + 1e-4,
        err_msg=f"golden mismatch for {scene_name}[{index}] — if the change "
                f"is intentional, regen with tools/make_goldens.py",
    )
    assert abs(stats["mean"] - float(data["mean"])) < 0.02 * scale + 1e-4
