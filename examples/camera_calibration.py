#!/usr/bin/env python
"""Camera calibration demo: recover camera pose and field-of-view from a
target image by gradient descent straight through the path tracer.

The reference's camera is a fixed forward-only frame builder
(camera.zig:17-53); here ``make_camera`` is differentiable, so
(look_from, vfov) can be optimized like any scene parameter — a second
inverse-rendering axis on top of examples/inverse_rendering.py's scene
parameters.

Camera translation moves the whole image: the loss signal is dominated
by silhouette/visibility shifts, where plain interior autodiff carries
almost no gradient (same reason sphere centers use edge-aware or FD
gradients in inverse.py). With only 3 camera scalars, correlated
central differences (inverse.fd_gradients) are exact and cheap — 6
renders per step. Intrinsics (vfov) are held fixed: at thumbnail
resolution, (distance, vfov) sit in the classic dolly-zoom ambiguity —
the optimizer drives the loss to the noise floor along the valley
without pinning either (measured; see --free-vfov to reproduce).

    python examples/camera_calibration.py [--steps 400] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--size", type=int, default=24)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None, help="write before/after PNGs")
    ap.add_argument("--free-vfov", action="store_true",
                    help="also optimize vfov (demonstrates the dolly-zoom "
                         "ambiguity: loss converges, pose need not)")
    args = ap.parse_args()

    if args.cpu:
        from zraytrace_tpu.runtime import force_cpu

        force_cpu()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from zraytrace_tpu import scene as sc
    from zraytrace_tpu.camera import make_camera
    from zraytrace_tpu.render_diff import render_diff
    from zraytrace_tpu.scene import SceneBuilder

    # A scene with enough parallax structure to pin the camera: two matte
    # balls + a mirror ball on the ground sphere.
    b = SceneBuilder()
    red = b.add_lambertian_color((0.8, 0.2, 0.1))
    blue = b.add_lambertian_color((0.15, 0.3, 0.75))
    silver = b.add_metal_color(sc.COLOR_SILVER)
    green = b.add_lambertian_color(sc.COLOR_GREEN)
    b.add_sphere((-1.1, 0.0, 3.0), 0.9, red)
    b.add_sphere((1.2, -0.2, 4.0), 0.7, blue)
    b.add_sphere((0.1, 0.5, 6.0), 1.0, silver)
    b.add_sphere((0.0, -51.0, 4.0), 50.0, green)
    scene = b.build()

    w = h = args.size
    true_from = jnp.asarray((0.4, 0.3, -5.0), jnp.float32)
    look_at = jnp.asarray((0.0, 0.0, 1.0), jnp.float32)
    true_vfov = jnp.float32(45.0)

    def render_at(cam_params):
        camera = make_camera(cam_params["look_from"], look_at,
                             (0.0, 1.0, 0.0), cam_params["vfov"], 1.0)
        return render_diff(scene, camera, w, h, args.spp, 4, seed=7)

    target = render_at({"look_from": true_from, "vfov": true_vfov})
    target = jnp.asarray(np.asarray(target))  # constant: no grad into it

    # Perturbed initial guess.
    params = {
        "look_from": true_from + jnp.asarray((0.2, -0.15, 0.3), jnp.float32),
        "vfov": true_vfov + (4.0 if args.free_vfov else 0.0),
    }
    fields = ("look_from", "vfov") if args.free_vfov else ("look_from",)

    def loss_fn(p):
        diff = render_at(p) - target
        return jnp.mean(diff * diff)

    loss_jit = jax.jit(loss_fn)

    from zraytrace_tpu.inverse import fd_gradients

    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def apply(p, s, grads):
        grads = {**{k: jnp.zeros_like(p[k]) for k in p}, **grads}
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s

    losses = []
    for i in range(args.steps):
        losses.append(float(loss_jit(params)))
        grads = fd_gradients(loss_jit, params, fields)
        params, opt_state = apply(params, opt_state, grads)

    rec_f = np.asarray(params["look_from"])
    rec_v = float(params["vfov"])
    print(f"loss: {losses[0]:.6f} -> {losses[-1]:.6f}")
    print(f"look_from: true (+0.400, +0.300, -5.000)  recovered "
          f"({rec_f[0]:+.3f}, {rec_f[1]:+.3f}, {rec_f[2]:+.3f})")
    print(f"vfov:      true 45.00                     recovered {rec_v:.2f}")

    if args.out:
        from zraytrace_tpu.io.png import write_png

        write_png(args.out + ".target.png", np.asarray(target))
        write_png(args.out + ".recovered.png", np.asarray(render_at(params)))

    pos_err = float(np.linalg.norm(rec_f - np.asarray(true_from)))
    ok = losses[-1] < losses[0] * 0.25 and pos_err < 0.2
    print(f"RECOVERY {'OK' if ok else 'INCOMPLETE'} (pos err {pos_err:.3f})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
