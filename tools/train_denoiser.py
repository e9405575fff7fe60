"""Train the learned denoiser (denoise/unet.py) on self-rendered pairs.

The reference ships NVIDIA's pretrained OptiX denoiser weights
(denoiser.h:14-146); the TPU framework trains its own tiny guided U-Net on
images rendered by THIS renderer — noisy (4/16/64 spp) vs converged
(high-spp) pairs over scenes spanning diffuse GI, glossy metals, emissive
lights and sky lighting, with albedo/normal AOV guides.

Usage:
  python tools/train_denoiser.py            # render data + train + save
  python tools/train_denoiser.py --steps 4000
Data is cached in /tmp/denoiser_data.npz (delete to re-render).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def render_dataset(path: str):
    import jax
    import dataclasses

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_comp"),
    )
    from fredholm_tpu.renderer import Renderer
    from fredholm_tpu.scene.procedural import (
        cornell_box,
        furnace_sphere,
        sphere_array_test,
    )
    from fredholm_tpu.scene.types import Material

    views = []

    def cam(r, origin, pitch=0.0):
        r.camera.origin = np.asarray(origin, np.float32)
        r.camera.look_around(0.0, pitch)
        r.camera._update_transform()

    # (name, scene factory, camera, sky setter, ref_spp)
    def sky_none(r):
        pass

    def sky_hosek(r):
        r.set_directional_light(
            [2.0, 1.9, 1.8], [0.35, 0.75, 0.3], angle=0.5
        )
        r.load_arhosek_sky(turbidity=3.0, albedo=0.3)

    specs = [
        ("cornell_a", cornell_box, [0.0, 1.0, 0.6], 0.0, sky_none, 2048),
        ("cornell_b", cornell_box, [0.4, 1.4, 1.2], -0.15, sky_none, 2048),
        ("cornell_dim", lambda: cornell_box(light_le=(3.0, 2.6, 2.2)),
         [-0.3, 0.8, 1.0], 0.1, sky_none, 2048),
        ("metals", lambda: sphere_array_test(
            "metalness", list(np.linspace(0.0, 1.0, 8)),
            Material(base_color=(0.85, 0.55, 0.3),
                     specular_roughness=0.2)),
         [0.0, 1.2, 6.0], -0.1, sky_hosek, 512),
        ("rough", lambda: sphere_array_test(
            "specular_roughness", list(np.linspace(0.05, 0.9, 8)),
            Material(base_color=(0.6, 0.65, 0.8), metalness=1.0)),
         [0.5, 1.5, 5.5], -0.15, sky_hosek, 512),
        ("furnace", lambda: furnace_sphere(
            Material(base_color=(0.8, 0.4, 0.3), specular=0.5)),
         [0.0, 0.0, 2.5], 0.0, sky_none, 1024),
    ]

    W = H = 256
    data = {}
    for name, factory, origin, pitch, sky, ref_spp in specs:
        t0 = time.time()
        r = Renderer(width=W, height=H)
        r.set_scene(factory())
        cam(r, origin, pitch)
        sky(r)
        for spp_cum, tag in ((4, "s4"), (12, "s16"), (48, "s64")):
            r.render(n_samples=spp_cum, max_depth=6)
            data[f"{name}.{tag}.beauty"] = np.asarray(
                r.get_layer("beauty")
            ).reshape(H, W, 3)
        # continue accumulating to the converged reference
        r.render(n_samples=ref_spp - 64, max_depth=6)
        data[f"{name}.ref.beauty"] = np.asarray(
            r.get_layer("beauty")
        ).reshape(H, W, 3)
        data[f"{name}.albedo"] = np.asarray(
            r.get_layer("albedo")
        ).reshape(H, W, 3)
        data[f"{name}.normal"] = np.asarray(
            r.get_layer("normal")
        ).reshape(H, W, 3)
        print(f"{name}: {time.time()-t0:.0f}s", flush=True)
    np.savez_compressed(path, **data)
    return data


def train(data, steps: int, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import optax

    from fredholm_tpu.denoise.unet import (
        apply_unet,
        encode_inputs,
        init_params,
        save_params,
    )

    names = sorted({k.split(".")[0] for k in data})
    # [V, H, W, C] stacks per spp level
    levels = ["s4", "s16", "s64"]
    noisy = {
        lv: jnp.asarray(
            np.stack([data[f"{n}.{lv}.beauty"] for n in names])
        )
        for lv in levels
    }
    ref = jnp.asarray(np.stack([data[f"{n}.ref.beauty"] for n in names]))
    alb = jnp.asarray(np.stack([data[f"{n}.albedo"] for n in names]))
    nrm = jnp.asarray(np.stack([data[f"{n}.normal"] for n in names]))

    PATCH = 64
    BATCH = 48
    V, H, W, _ = ref.shape

    def sample_batch(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        vi = jax.random.randint(k1, (BATCH,), 0, V)
        ys = jax.random.randint(k2, (BATCH,), 0, H - PATCH + 1)
        xs = jax.random.randint(k3, (BATCH,), 0, W - PATCH + 1)
        li = jax.random.randint(k4, (BATCH,), 0, len(levels))

        def crop(img4, vi, y, x):
            return jax.lax.dynamic_slice(
                img4[vi], (y, x, 0), (PATCH, PATCH, 3)
            )

        crops_n = []
        for b_lv, lv in enumerate(levels):
            crops_n.append(
                jax.vmap(lambda v, y, x: crop(noisy[lv], v, y, x))(
                    vi, ys, xs
                )
            )
        stacked = jnp.stack(crops_n)  # [L, B, P, P, 3]
        b_noisy = stacked[li, jnp.arange(BATCH)]
        b_ref = jax.vmap(lambda v, y, x: crop(ref, v, y, x))(vi, ys, xs)
        b_alb = jax.vmap(lambda v, y, x: crop(alb, v, y, x))(vi, ys, xs)
        b_nrm = jax.vmap(lambda v, y, x: crop(nrm, v, y, x))(vi, ys, xs)
        return b_noisy, b_ref, b_alb, b_nrm

    def loss_fn(params, key):
        b_noisy, b_ref, b_alb, b_nrm = sample_batch(key)
        x = jax.vmap(encode_inputs)(b_noisy, b_alb, b_nrm)
        res = apply_unet(params, x)
        irr = jnp.maximum(x[..., 0:3] + res, 0.0)
        irr_ref = jnp.log1p(b_ref / jnp.maximum(b_alb, 1e-3))
        # L1 in log-irradiance + gradient (edge) term
        l1 = jnp.abs(irr - irr_ref).mean()
        gy = jnp.abs(
            (irr[:, 1:] - irr[:, :-1])
            - (irr_ref[:, 1:] - irr_ref[:, :-1])
        ).mean()
        gx = jnp.abs(
            (irr[:, :, 1:] - irr[:, :, :-1])
            - (irr_ref[:, :, 1:] - irr_ref[:, :, :-1])
        ).mean()
        return l1 + 0.5 * (gx + gy)

    params = init_params(jax.random.PRNGKey(seed))
    sched = optax.cosine_decay_schedule(2e-3, steps, alpha=0.02)
    opt = optax.adam(sched)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        loss, g = jax.value_and_grad(loss_fn)(params, key)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, sub)
        if i % 200 == 0 or i == steps - 1:
            print(
                f"step {i}: loss {float(loss):.4f} "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
    save_params(params)
    print("saved", flush=True)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--data", type=str, default="/tmp/denoiser_data.npz")
    ap.add_argument("--render-only", action="store_true")
    args = ap.parse_args()

    if os.path.exists(args.data):
        data = dict(np.load(args.data))
        print(f"loaded cached data ({len(data)} arrays)")
    else:
        data = render_dataset(args.data)
    if not args.render_only:
        train(data, args.steps)


if __name__ == "__main__":
    main()
