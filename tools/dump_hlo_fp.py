"""Compare TPU HLO of the footprint gather: fast standalone vs slow in
temporal_accumulate. Print gather/fusion lines with backend configs."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import re, jax, jax.numpy as jnp
from nrdsample_tpu.denoise import common, relax

H = W = 512
s = relax.RelaxSettings()


def main():
    key = jax.random.PRNGKey(0)
    img10 = jax.random.uniform(key, (H, W, 10), jnp.float32)
    illum = jnp.zeros((H, W, 3), jnp.float32)
    vz = jnp.ones((H, W), jnp.float32)
    nrm = jnp.zeros((H, W, 3), jnp.float32)
    mv = jnp.zeros((H, W, 3), jnp.float32)
    hist = relax.RelaxHistory.create(H, W, jnp.float32)

    def fast(im, mv):
        return common.reproject(im, mv[..., :2])

    def slow(hi, il, vz, nrm, mv):
        return relax.temporal_accumulate(hi, il, vz, nrm, mv, s)

    for name, fn, args in (("fast", fast, (img10, mv)),
                           ("slow", slow, (hist, illum, vz, nrm, mv))):
        txt = jax.jit(fn).lower(*args).compile().as_text()
        with open(f"/tmp/hlo_fp_{name}.txt", "w") as f:
            f.write(txt)
        print(f"===== {name} =====", flush=True)
        for line in txt.splitlines():
            ls = line.strip()
            if re.search(r'= \S+ (gather|while)\(', ls):
                print(ls[:400], flush=True)
        # find fusions whose computation contains a gather
        comp = None
        gather_comps = set()
        for line in txt.splitlines():
            m = re.match(r'%?(\S+) \((.*)\) -> ', line.strip())
            if line.startswith('%fused') or ' %fused' in line[:40]:
                pass
        for m in re.finditer(r'(%fused_computation[^\s]*) ', txt):
            gather_comps.add(m.group(1))
        for c in sorted(gather_comps):
            body_m = re.search(re.escape(c) + r' \{(.*?)\n\}', txt, re.S)
            if body_m and 'gather(' in body_m.group(1):
                nlines = body_m.group(1).count('\n')
                print(f"fusion computation {c}: {nlines} ops, has gather",
                      flush=True)


if __name__ == "__main__":
    main()
