"""Fused bounce-megakernel render path (TPU Pallas).

Component-form (structure-of-arrays) re-expression of the integrator's
per-bounce math so an entire bounce — sampler draws, surface fill, BSDF
setup/eval/sample, NEE, MIS, ray emission — runs as ONE Pallas kernel over
VMEM-resident ray tiles instead of ~30 fused-XLA launches. Kernel-launch
overhead dominates the axon backend (~0.9 ms x ~150 launches/step,
PERF.md), and on real TPUs the same fusion removes the HBM round-trips
between stages.

Vectors here are V3 triples of identically-shaped arrays (natural lane
layout for the TPU VPU: each component is a [sublane, 128] tile), not the
[..., 3] stacked layout of the jnp reference path; the jnp path remains
the correctness oracle (tests assert equivalence).
"""
