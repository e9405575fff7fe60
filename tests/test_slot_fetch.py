"""Cluster-block attribute fetch (fused/slot_fetch.py) + the traversal's
hit-slot output.

The slot path replaces the per-lane HBM row gather for large geometry
tables (the measured large-scene shading wall, PERF.md round 5). It must
be INVISIBLE: slot maps to the same face the traversal reports, fetched
attr planes equal the gather-path rows bit-for-bit, and fused renders
are unchanged with the kernel on or off.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from fredholm_tpu.accel import pallas_clustered as pc
from fredholm_tpu.accel.cluster import build_tlas
from fredholm_tpu.renderer import Renderer
from fredholm_tpu.scene.procedural import terrain

from test_bvh import _sphere_blas


class TestSlotOutput:
    def test_slot_maps_to_prim_via_blocks(self):
        h, v0, e1, e2 = _sphere_blas()
        tlas = build_tlas([h], [(0, np.eye(4))])
        dev_c = pc.prepare_clustered(tlas)
        rng = np.random.default_rng(3)
        n = 2048
        o = rng.normal(size=(n, 3)).astype(np.float32)
        o = 1.6 * o / np.linalg.norm(o, axis=-1, keepdims=True)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        got = pc.intersect_closest_clustered(
            dev_c, jnp.asarray(o), jnp.asarray(d), 1e9
        )
        hit = np.asarray(got["hit"])
        slot = np.asarray(got["slot"])
        prim = np.asarray(got["prim"])
        assert hit.any()
        # slot -> face id through the triangle-block table
        row9 = np.asarray(tlas.blocks[9])
        np.testing.assert_array_equal(
            row9[slot[hit]].astype(np.int32), prim[hit]
        )
        assert (slot[~hit] == -1).all()


class TestFetchKernel:
    def test_matches_row_gather(self):
        from fredholm_tpu.fused.pt_fused import COL, GEOM_COLS_USED
        from fredholm_tpu.fused.slot_fetch import (
            A_USED,
            fetch_geom_by_slot,
        )

        assert A_USED == GEOM_COLS_USED
        r = Renderer(width=16, height=16)
        r.set_scene(terrain(n=48, size=6.0))  # 4608 faces > ONEHOT_MAX
        dev = r._arrays()
        assert "slot_attrs" in dev
        row9 = np.asarray(dev["clusters"]["blocks"])[9]
        n_slots = row9.shape[0]
        rng = np.random.default_rng(11)
        filled = np.where(row9 >= 0)[0]
        slots = rng.choice(filled, size=700).astype(np.int32)
        slots = np.concatenate([slots, np.full((68,), -1, np.int32)])
        rng.shuffle(slots)
        got = fetch_geom_by_slot(dev, jnp.asarray(slots))
        table = np.asarray(dev["fused_table"])
        prim = np.where(slots >= 0, row9[np.clip(slots, 0, n_slots - 1)],
                        0).astype(np.int64)
        for c in range(A_USED):
            want = np.where(slots >= 0, table[prim, c], 0.0)
            np.testing.assert_array_equal(
                np.asarray(got[c]), want.astype(np.float32),
                err_msg=f"col {c}",
            )


class TestRenderEquivalence:
    def _render(self, slot_on):
        os.environ["FREDHOLM_SLOT_FETCH"] = "1" if slot_on else "0"
        try:
            r = Renderer(width=16, height=16)
            r.use_pallas = True  # clustered path (interpret on CPU)
            r.set_scene(terrain(n=48, size=6.0))
            r.camera.origin = np.asarray([0.0, 2.6, 5.5], np.float32)
            r.camera.look_around(0.0, -0.35)
            r.camera._update_transform()
            r.set_directional_light((2.0, 1.9, 1.8), (0.35, 0.75, 0.3),
                                    angle=0.5)
            r.load_arhosek_sky(3.0, 0.3)
            assert ("slot_attrs" in r._arrays()) == slot_on
            r.render(n_samples=2, max_depth=3)
            return {k: np.asarray(v) for k, v in r.layers.items()}
        finally:
            os.environ.pop("FREDHOLM_SLOT_FETCH", None)

    def test_fused_render_unchanged(self):
        a = self._render(slot_on=True)
        b = self._render(slot_on=False)
        for k in ("beauty", "normal", "depth", "albedo"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
