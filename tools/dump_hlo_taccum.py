"""Dump optimized HLO for the slow stage-2 temporal-accumulate graph."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import re, collections, jax, jax.numpy as jnp
from nrdsample_tpu.denoise import common, relax


def main():
    h, w = 1080, 1920
    illum = jnp.zeros((h, w, 3), jnp.float32)
    vz = jnp.ones((h, w), jnp.float32)
    nrm = jnp.zeros((h, w, 3), jnp.float32)
    mv = jnp.zeros((h, w, 3), jnp.float32)
    hist = relax.RelaxHistory.create(h, w, jnp.float32)
    s = relax.RelaxSettings()

    def stage2(hi, il, mv):
        mv_xy = mv[..., :2]
        outs = common.reproject_many(
            [hi.illum, hi.moments, hi.view_z, hi.normal, hi.frames], mv_xy)
        prev_illum, prev_moments, prev_z, prev_n, prev_frames = outs
        return common.disocclusion_weight(
            vz, mv[..., 2], prev_z, nrm, prev_n, s.disocclusion_threshold)

    def stage1(hi, il, mv):
        mv_xy = mv[..., :2]
        outs = common.reproject_many(
            [hi.illum, hi.moments, hi.view_z, hi.normal, hi.frames], mv_xy)
        return outs[0]

    for name, fn in (('stage1', stage1), ('stage2', stage2)):
        txt = jax.jit(fn).lower(hist, illum, mv).compile().as_text()
        ops = collections.Counter(
            re.findall(r'= \S+ ([a-z-]+)\(', txt))
        print(name, 'op histogram:', dict(ops.most_common(15)), flush=True)
        with open(f'/tmp/hlo_{name}.txt', 'w') as f:
            f.write(txt)
        # show gather lines
        for line in txt.splitlines():
            if 'gather' in line and '=' in line:
                print(name, 'GATHER:', line.strip()[:300], flush=True)


if __name__ == '__main__':
    main()
