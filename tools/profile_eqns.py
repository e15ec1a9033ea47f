"""Eqn-count breakdown of the flagship pipeline subgraphs (compile-cost audit)."""
import os, sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _setup
from tools.profile_compile import count_eqns


def n_eqns(fn, *args):
    return count_eqns(jax.jit(fn).trace(*args).jaxpr.jaxpr)


def main():
    from nrdsample_tpu.pipeline import frame as frame_mod

    ctx, scene, cam, cfg, settings, history = _setup(16, 16, bounce_num=1,
                                                     flagship=True)

    def tf(scene, cam, settings, history):
        return frame_mod.trace_frame(ctx, scene, cam, cfg, settings, history)

    gb, aux = jax.eval_shape(tf, scene, cam, settings, history)
    print("trace_frame eqns:", n_eqns(tf, scene, cam, settings, history), flush=True)

    gb_c, aux_c = jax.jit(tf)(scene, cam, settings, history)

    def imf(settings, cam, history, gb, aux):
        return frame_mod.image_frame(cfg, settings, cam, history, gb, aux)

    print("image_frame eqns:", n_eqns(imf, settings, cam, history, gb_c, aux_c),
          flush=True)

    # sub-breakdown of trace_frame
    from nrdsample_tpu.render import sharc_update, trace_opaque
    from nrdsample_tpu.render import trace_transparent as tt
    from nrdsample_tpu.ops import traversal

    ctxs = ctx if isinstance(ctx, traversal.SceneContexts) else None
    frame = history.frame_index

    def su(scene, cam, settings):
        return sharc_update.sharc_update_pass(
            ctxs.opaque, scene, cam, cfg, settings, frame, history.sharc)
    print("  sharc_update eqns:", n_eqns(su, scene, cam, settings), flush=True)

    def to(scene, cam, settings):
        return trace_opaque.trace_opaque(
            ctxs.opaque, scene, cam, cfg, settings, frame, None,
            history.sharc, history.l1)
    print("  trace_opaque eqns:", n_eqns(to, scene, cam, settings), flush=True)

    pidx = jnp.arange(cfg.n_pixels, dtype=jnp.int32)

    def ttf(scene, cam, settings, gb):
        return tt.trace_transparent_color(
            ctxs, scene, cam, cfg, settings, frame, gb, pidx, history.sharc)
    print("  trace_transparent eqns:", n_eqns(ttf, scene, cam, settings, gb_c),
          flush=True)

    # image subparts
    from nrdsample_tpu.denoise import relax, sigma, taa

    def img(a):
        return a.reshape((cfg.height, cfg.width) + a.shape[1:])

    s = relax.RelaxSettings(max_accumulated_frames=30)

    def rl(diff, vz, nrm, mv):
        return relax.denoise(history.relax_diff, img(diff), img(vz), img(nrm),
                             img(mv), s)
    print("  relax.denoise eqns:",
          n_eqns(rl, gb_c["diff_radiance"], gb_c["view_z"], gb_c["normal"],
                 gb_c["mv"]), flush=True)

    from nrdsample_tpu.scene import camera as cam_mod
    tan_sun = jnp.tan(jnp.deg2rad(settings.sun_angular_diameter * 0.5))
    unproj = cam_mod.unproject_scale(cam, cfg.height)

    def sg(shadow, shd, vz, mv):
        return sigma.denoise(history.sigma, img(shadow), img(shd), img(vz),
                             img(mv), tan_sun, unproj, frame)
    print("  sigma.denoise eqns:",
          n_eqns(sg, gb_c["shadow"], gb_c["shadow_hit_dist"], gb_c["view_z"],
                 gb_c["mv"]), flush=True)


if __name__ == "__main__":
    main()
