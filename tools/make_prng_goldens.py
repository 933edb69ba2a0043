"""Regenerate the committed CPU-recorded PRNG goldens.

tests/goldens/prng_goldens.npz pins the fused kernel's counter-hash PRNG
stream at three levels (see fused_render.prng_probe): the CPU suite asserts
the Pallas *interpreter* reproduces all entries bit-exactly
(tests/test_fused_render.py::test_prng_probe_matches_committed_goldens);
bench.py asserts on the chip that (1) the 'uniform' entry reproduces
bit-exactly compiled, (2) compiled == interpreter on-chip bit-exactly for
gaussian/cauchy, and (3) gaussian/cauchy match these CPU values to a tight
tolerance (TPU transcendentals round differently than CPU libm, so
cross-platform bit-identity holds only for the integer/uniform stage).
Rerun this only when the stream intentionally changes (and say so in the
commit message).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from pertrenderer_tpu.ops import fused_render as fr  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), os.pardir, "tests", "goldens",
                   "prng_goldens.npz")

out = {}
for nt in ("uniform", "gaussian", "cauchy"):
    out[nt] = np.asarray(fr.prng_probe(nt, interpret=True))
    print(nt, out[nt].shape, float(out[nt].mean()), float(out[nt].std()))
np.savez(OUT, **out)
print("wrote", os.path.abspath(OUT))
