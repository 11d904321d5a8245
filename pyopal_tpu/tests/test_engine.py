"""In-wheel engine cross-check: interpret-mode kernel vs scalar oracle.

Runs the unified v2 ragged Pallas kernel in interpreter mode (backend
independent) over a small ragged database — empty target, lengths
straddling the 64-column chunk quantum — and asserts score/end
equality with the scalar oracle for a local and a global algorithm.
This is the installed-artifact analog of the repository's
``tests/test_engines.py`` oracle gate.
"""

import unittest

import numpy as np


class TestEngineOracle(unittest.TestCase):
    def test_v2_kernel_matches_oracle(self):
        import jax.numpy as jnp

        from pyopal_tpu.matrices import ScoringMatrix
        from pyopal_tpu.ops import naive, packing
        from pyopal_tpu.ops import pallas_ragged as pr

        S = ScoringMatrix.from_name("BLOSUM62").int_data()
        rng = np.random.default_rng(7)
        seqs = [
            rng.integers(0, 20, int(n)).astype(np.uint8)
            for n in (0, 3, 63, 64, 65, 30)
        ]
        fp = packing.pack_sequences_flat(seqs)
        flat_t = jnp.asarray(fp.flat_targets)
        lengths = jnp.asarray(fp.lengths)
        bos = jnp.asarray(fp.block_of_step)
        cos = jnp.asarray(fp.chunk_of_step)
        los = jnp.asarray(fp.last_of_step)
        idx = fp.indices.reshape(-1)

        query = rng.integers(0, 20, 40).astype(np.uint8)
        profs = jnp.asarray(
            pr.make_profiles_host([query], S), jnp.bfloat16
        )
        qlens = jnp.asarray([len(query)], jnp.int32)

        for algo in ("sw", "nw"):
            s, qe, te = pr.search_flat(
                profs,
                qlens,
                flat_t,
                lengths,
                bos,
                cos,
                los,
                3,
                1,
                algo,
                True,
                interpret=True,
                chunk=fp.chunk,
                safe_pad=True,
            )
            s = np.asarray(s).reshape(-1)
            qe = np.asarray(qe).reshape(-1)
            te = np.asarray(te).reshape(-1)
            for pos in range(idx.shape[0]):
                i = idx[pos]
                if i < 0:
                    continue
                ns, nqe, nte = naive.score_end(
                    query, seqs[i], S, 3, 1, algo
                )
                self.assertEqual(ns, s[pos], (algo, i))
                if len(seqs[i]):
                    self.assertEqual((nqe, nte), (qe[pos], te[pos]), (algo, i))
