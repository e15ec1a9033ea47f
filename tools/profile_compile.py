"""Compile-cost breakdown for the flagship pipeline on the virtual CPU mesh.

Usage: python tools/profile_compile.py [stage ...]
Stages: fwd      — single-device flagship render_frame jit (lower+compile)
        grad     — single-device value_and_grad step
        shard    — 8-device sharded render fn (forward only)
        step     — 8-device sharded train step (the dryrun workload)
Each stage prints jaxpr eqn count, lowering time, compile time.
"""
import os, sys, time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _setup


def count_eqns(jaxpr, seen=None):
    if seen is None:
        seen = set()
    n = 0
    for eq in jaxpr.eqns:
        n += 1
        for v in eq.params.values():
            if hasattr(v, "jaxpr"):
                n += count_eqns(v.jaxpr, seen)
            elif isinstance(v, (list, tuple)):
                for vv in v:
                    if hasattr(vv, "jaxpr"):
                        n += count_eqns(vv.jaxpr, seen)
    return n


def report(name, fn, *args):
    t0 = time.time()
    traced = jax.jit(fn).trace(*args)
    t1 = time.time()
    n_eq = count_eqns(traced.jaxpr.jaxpr)
    lowered = traced.lower()
    t2 = time.time()
    compiled = lowered.compile()
    t3 = time.time()
    print(f"{name:8s} eqns={n_eq:7d} trace={t1-t0:6.1f}s lower={t2-t1:6.1f}s "
          f"compile={t3-t2:6.1f}s", flush=True)
    return compiled


def main():
    stages = sys.argv[1:] or ["fwd", "grad", "shard", "step"]
    from nrdsample_tpu.pipeline import frame as frame_mod
    from nrdsample_tpu.pipeline import train as train_mod
    from nrdsample_tpu.parallel import mesh as mesh_mod

    ctx, scene, cam, cfg, settings, history = _setup(16, 16, bounce_num=1,
                                                     flagship=True)
    if "fwd" in stages:
        def fwd(scene, cam, settings, history):
            out, h = frame_mod.render_frame(ctx, scene, cam, cfg, settings, history)
            return out["color"], h
        report("fwd", fwd, scene, cam, settings, history)

    if "grad" in stages:
        loss_fn = train_mod.make_loss_fn(ctx, cfg)
        target = jnp.zeros((cfg.n_pixels, 3), cfg.dtype)
        md, mr = train_mod.split_materials(scene.materials)
        def g(md, mr, scene, cam, settings, history, target):
            return jax.value_and_grad(loss_fn)(md, mr, scene, cam, settings,
                                               history, target)
        report("grad", g, md, mr, scene, cam, settings, history, target)

    if "shard" in stages or "step" in stages:
        mesh = mesh_mod.make_mesh(8)
        pixel_idx = mesh_mod.shard_pixels(mesh, cfg.n_pixels)
        target = jnp.zeros((cfg.n_pixels, 3), cfg.dtype)
        target = jax.device_put(target, mesh_mod.pixel_sharding(mesh))
        if "shard" in stages:
            rf = mesh_mod.sharded_render_fn(ctx, cfg, mesh)
            def fwd8(scene, cam, settings, history, pixel_idx):
                out, h = rf(scene, cam, settings, history, pixel_idx)
                return out["color"], h
            report("shard", fwd8, scene, cam, settings, history, pixel_idx)
        if "step" in stages:
            step = train_mod.make_sharded_train_step(ctx, cfg, mesh)
            # step is already jitted; trace/lower/compile manually
            t0 = time.time()
            lowered = step.lower(scene.materials, scene, cam, settings, history,
                                 target, pixel_idx)
            t1 = time.time()
            compiled = lowered.compile()
            t2 = time.time()
            print(f"step     lower={t1-t0:6.1f}s compile={t2-t1:6.1f}s", flush=True)


if __name__ == "__main__":
    main()
