"""Capture a runtime profiler trace of slow taccum vs fast reproject on TPU,
then print per-op durations from the trace protobuf."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob, gzip, json, time

import jax, jax.numpy as jnp

from nrdsample_tpu.denoise import common, relax

H = W = 512
s = relax.RelaxSettings()


def main():
    key = jax.random.PRNGKey(0)
    illum = jax.random.uniform(key, (H, W, 3), jnp.float32)
    vz = jnp.ones((H, W), jnp.float32)
    nrm = jnp.zeros((H, W, 3), jnp.float32).at[..., 2].set(1.0)
    mv = jnp.zeros((H, W, 3), jnp.float32)
    hist = relax.RelaxHistory.create(H, W, jnp.float32)

    slow = jax.jit(lambda hi, il, vz, nrm, mv:
                   relax.temporal_accumulate(hi, il, vz, nrm, mv, s))
    fast = jax.jit(lambda hi, il, vz, nrm, mv: common.reproject_many(
        [hi.illum, hi.moments, hi.view_z, hi.normal, hi.frames], mv[..., :2]))

    for fn in (slow, fast):
        jax.block_until_ready(fn(hist, illum, vz, nrm, mv))
        jax.block_until_ready(fn(hist, illum, vz, nrm, mv))

    outdir = "/tmp/jaxtrace"
    with jax.profiler.trace(outdir):
        for _ in range(5):
            out = fn and None
            o1 = slow(hist, illum, vz, nrm, mv)
        jax.block_until_ready(o1)
        for _ in range(5):
            o2 = fast(hist, illum, vz, nrm, mv)
        jax.block_until_ready(o2)
    print("trace captured", flush=True)
    for f in glob.glob(outdir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(f) as fh:
            data = json.load(fh)
        evs = [e for e in data.get("traceEvents", [])
               if e.get("ph") == "X" and e.get("dur", 0) > 50]
        evs.sort(key=lambda e: -e["dur"])
        print(f"== {f} ==", flush=True)
        for e in evs[:40]:
            print(f"  {e['dur']:>9} us  {e.get('name','?')[:100]}", flush=True)


if __name__ == "__main__":
    main()
