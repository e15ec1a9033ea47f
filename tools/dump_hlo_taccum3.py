"""Dump optimized TPU HLO for slow vs fast taccum forms; find the culprit op."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import re, collections, jax, jax.numpy as jnp
from nrdsample_tpu.denoise import common, relax

H = W = 512
s = relax.RelaxSettings()


def main():
    illum = jnp.zeros((H, W, 3), jnp.float32)
    vz = jnp.ones((H, W), jnp.float32)
    nrm = jnp.zeros((H, W, 3), jnp.float32)
    mv = jnp.zeros((H, W, 3), jnp.float32)
    hist = relax.RelaxHistory.create(H, W, jnp.float32)

    def fast_reproj(hi, il, vz, nrm, mv):
        return common.reproject_many(
            [hi.illum, hi.moments, hi.view_z, hi.normal, hi.frames],
            mv[..., :2])

    def slow_full(hi, il, vz, nrm, mv):
        return relax.temporal_accumulate(hi, il, vz, nrm, mv, s)

    for name, fn in (('fast_reproj', fast_reproj), ('slow_full', slow_full)):
        txt = jax.jit(fn).lower(hist, illum, vz, nrm, mv).compile().as_text()
        ops = collections.Counter(re.findall(r'= \S+ ([a-z-]+)\(', txt))
        print(name, 'ops:', dict(ops.most_common(20)), flush=True)
        with open(f'/tmp/hlo_{name}.txt', 'w') as f:
            f.write(txt)
        for line in txt.splitlines():
            ls = line.strip()
            if re.match(r'\S+ = \S+ (gather|transpose|copy|while|fusion)\(',
                        ls):
                print(name, '|', ls[:240], flush=True)


if __name__ == '__main__':
    main()
