"""Regenerate the committed interpreter-mode PRNG goldens.

tests/goldens/prng_goldens.npz pins the fused kernel's counter-hash PRNG
stream: the CPU suite asserts the Pallas *interpreter* reproduces it
bit-exactly (tests/test_fused_render.py::test_prng_probe_matches_committed_
goldens) and bench.py asserts the *compiled* Mosaic kernel reproduces it
bit-exactly on the chip.  Rerun this only when the stream intentionally
changes (and say so in the commit message).
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
for nt in ("gaussian", "cauchy"):
    out[nt] = np.asarray(fr.prng_probe(nt, interpret=True))
    print(nt, out[nt].shape, float(out[nt].mean()), float(out[nt].std()))
np.savez(OUT, **out)
print("wrote", os.path.abspath(OUT))
