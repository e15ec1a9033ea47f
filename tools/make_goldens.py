"""Regenerate the golden-image regression stats for the CHECK_ME records.

The reference's Tests/*.bin states exist to catch image-quality regressions
(Source/NRDSample.cpp:1771-1948, human-inspected); this stores per-tile
statistics per CHECK_ME record so tests/test_golden.py can assert them
automatically. Re-run AFTER an intentional image-affecting change and commit
the updated Tests/golden/*.npz alongside it (the reference's "Add" button
workflow).

Usage: python tools/make_goldens.py  (CPU, ~1 min)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from nrdsample_tpu.pipeline import records, replay

RES = 64


def main():
    os.makedirs(replay.GOLDEN_DIR, exist_ok=True)
    names = sorted({s for s in records.CHECK_ME})
    contexts = replay.build_contexts(names)
    for scene_name in names:
        for index in records.CHECK_ME[scene_name]:
            out, _ = replay.render_record(contexts, scene_name, index, res=RES)
            stats = replay.golden_stats(np.asarray(out["color"]), RES)
            path = replay.golden_path(scene_name, index)
            np.savez(path, res=RES, **stats)
            print(f"wrote {path}  mean={stats['mean']:.4f} "
                  f"std={stats['std']:.4f}", flush=True)


if __name__ == "__main__":
    main()
