"""Compute engines for the database search.

Three implementations of the same DP semantics
(`pyopal_tpu.models.specs`):

- `naive`   — scalar numpy oracle with full traceback; ground truth.
- `xla`     — vectorized ``jax.numpy`` column-sweep engine (any backend);
              CPU fallback and correctness cross-check for the kernel.
- `pallas_kernel` — the TPU Pallas kernel: inter-sequence vectorization
              (one database sequence per VPU lane), one-hot MXU profile
              matmul, exact log-depth max-plus F scan.

`packing` builds the length-bucketed padded device layout shared by the
vectorized engines; `traceback` reconstructs full alignments for
``mode="full"``.
"""
