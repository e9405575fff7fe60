"""Measured-loser implementations, quarantined off the hot path.

Each module here is a complete, tested design that was built, chip-A/B'd,
and REJECTED on the target hardware (findings preserved in PERF.md).
They are kept compiled-out behind env gates for A/B runs on future
backends where the cost model differs (cheaper irregular gathers, slower
dispatch pipelining, different VMEM sizes):

- pt_regen.py        sample-slot regeneration wavefront (FREDHOLM_REGEN=1):
                     3x LOSS on cornell 512 — stage count is gated by the
                     slowest lane's sequential sample chain while each
                     stage pays a ~2.3x premium (PERF.md round 3).
- pallas_resident.py ray-resident geometry-streamed traversal
                     (FREDHOLM_TRAV_RESIDENT=1): loses everywhere — per-
                     tile front-to-back tightening prunes ~2x harder than
                     any global stream order (PERF.md round 4).
- compact.py         alive-first wavefront packing around trace calls
                     (FREDHOLM_COMPACT=1): 0.04-0.99x — row scatter/gather
                     is HBM-random traffic the tile-skip savings never
                     repay; occupancy is a TILE property on this hardware
                     (PERF.md round 4).

The production integrator has ONE fast path: fused/pt_fused.py over the
ordered clustered traversal (accel/pallas_clustered.py).
"""
