"""Record golden outputs/gradients from the PyTorch reference estimators.

Runs the reference's own modules (`/root/reference/randomras/smoothrast.py`,
`/root/reference/randomras/smoothagg.py` — loaded by file path so the
pytorch3d-importing package __init__ is bypassed) on small fixed cases and
saves the results to tests/goldens/reference_goldens.npz.  The JAX test
(tests/test_reference_goldens.py) asserts our estimators reproduce these
numbers: exactly for the deterministic members, to ~1e-3 at matched large
sample counts for the Monte-Carlo members (BASELINE.md north star: gradients
matching the reference to 1e-3).

Run once wherever torch is available:

    python tools/make_reference_goldens.py

Deterministic cases are exact; MC cases use fixed torch seeds, batch
replication (independent noise per replica) and repeated calls so the
recorded values are S_total-sample estimates with realized MC error well
under the test tolerance.
"""

import importlib.util
import os

import numpy as np
import torch

REF = "/root/reference/randomras"
OUT = os.path.join(os.path.dirname(__file__), os.pardir, "tests", "goldens",
                   "reference_goldens.npz")

# MC effort: B replicas x S samples/call x R repeated calls per case.
B, S, R = 64, 2048, 128  # 16.8M effective samples


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


sr = _load("smoothrast")
sa = _load("smoothagg")

rng = np.random.RandomState(0)
out = {}

# ---------------------------------------------------------------- inputs --
# O(1)-scale inputs so absolute 1e-3 tolerances are meaningful.
DISTS = rng.uniform(-1.2, 1.2, size=(1, 4, 4, 5)).astype(np.float32)
W = rng.uniform(-1.0, 1.0, size=(1, 4, 4, 5)).astype(np.float32)
SIGMA = 0.5

Z = rng.uniform(-1.0, 1.0, size=(1, 4, 4, 6)).astype(np.float32)
WAGG = rng.uniform(-1.0, 1.0, size=(1, 4, 4, 6)).astype(np.float32)
GAMMA = 0.4

# aggregate()-level inputs (the shared z_map preamble, smoothagg.py:173-181)
ZBUF = np.sort(rng.uniform(3.0, 9.0, size=(1, 4, 4, 5)).astype(np.float32),
               axis=-1)
MASK = (rng.uniform(size=(1, 4, 4, 5)) > 0.25).astype(np.float32)
PROB_RAW = rng.uniform(0.05, 1.0, size=(1, 4, 4, 5)).astype(np.float32)
PROB = (PROB_RAW * MASK).astype(np.float32)  # zero coverage where masked out
ZFAR, ZNEAR = 100.0, 1.0
AGG_GAMMA, AGG_ALPHA = 0.3, 1.0

out.update(dists=DISTS, w=W, sigma=np.float32(SIGMA), z=Z, wagg=WAGG,
           gamma=np.float32(GAMMA), zbuf=ZBUF, mask=MASK, prob=PROB,
           zfar=np.float32(ZFAR), znear=np.float32(ZNEAR),
           agg_gamma=np.float32(AGG_GAMMA), agg_alpha=np.float32(AGG_ALPHA),
           mc_samples=np.int64(B * S * R))


def _t(x, grad=False):
    t = torch.tensor(x)
    if grad:
        t.requires_grad_(True)
    return t


# --------------------------------------------------- deterministic members --
def det_rast(cls, tag, sigma=SIGMA, differentiable=True):
    d = _t(DISTS, grad=differentiable)
    m = cls() if cls is sr.HardRast else cls(sigma=sigma)
    prob = m.rasterize(d)
    out[f"{tag}_fwd"] = prob.detach().numpy()
    if differentiable:
        loss = (prob * _t(W)).sum()
        loss.backward()
        out[f"{tag}_grad_dists"] = d.grad.numpy()
        if m.sigma.grad is not None:
            out[f"{tag}_grad_sigma"] = m.sigma.grad.numpy()


det_rast(sr.SoftRast, "softrast")
det_rast(sr.AffineRast, "affinerast")
det_rast(sr.HardRast, "hardrast", differentiable=False)


def det_agg(cls, tag, differentiable=True):
    zbuf = _t(ZBUF, grad=differentiable)
    prob = _t(PROB, grad=differentiable)
    m = cls(gamma=AGG_GAMMA, alpha=AGG_ALPHA) if cls is sa.SoftAgg else cls()
    w = m.aggregate(zbuf, ZFAR, ZNEAR, prob, _t(MASK))
    out[f"{tag}_fwd"] = w.detach().numpy()
    if differentiable:
        loss = (w * _t(WAGG)).sum()
        loss.backward()
        out[f"{tag}_grad_zbuf"] = zbuf.grad.numpy()
        out[f"{tag}_grad_prob"] = prob.grad.numpy()
        out[f"{tag}_grad_gamma"] = m.gamma.grad.numpy()
        out[f"{tag}_grad_alpha"] = m.alpha.grad.numpy()


det_agg(sa.SoftAgg, "softagg")
det_agg(sa.HardAgg, "hardagg", differentiable=False)


# ------------------------------------------------------------- MC members --
def mc_rast(cls, tag, seed):
    """Batch-replicated large-S estimate of GaussianRast/ArctanRast/_wovr
    forward + VR score-function grads (smoothrast.py:39-59)."""
    torch.manual_seed(seed)
    d_rep = np.repeat(DISTS, B, axis=0)
    w_rep = _t(np.repeat(W, B, axis=0))
    fwd = np.zeros_like(d_rep, dtype=np.float64)
    g_d = np.zeros_like(d_rep, dtype=np.float64)
    g_sig = 0.0
    for _ in range(R):
        d = _t(d_rep, grad=True)
        m = cls(nb_samples=S, sigma=SIGMA)
        prob = m.rasterize(d)
        (prob * w_rep).sum().backward()
        fwd += prob.detach().numpy()
        g_d += d.grad.numpy()
        g_sig += float(m.sigma.grad)
    out[f"{tag}_fwd"] = (fwd / R).mean(0, keepdims=True).astype(np.float32)
    out[f"{tag}_grad_dists"] = (
        (g_d / R).mean(0, keepdims=True).astype(np.float32))
    out[f"{tag}_grad_sigma"] = np.float32(g_sig / (R * B))


mc_rast(sr.GaussianRast, "gaussianrast", seed=1)
mc_rast(sr.GaussianRast_wovr, "gaussianrast_wovr", seed=2)
mc_rast(sr.ArctanRast, "arctanrast", seed=3)


def mc_argmax(fn_cls, tag, noise_type, seed):
    """Large-S estimate of the raw perturbed argmax (smoothagg.py:10-141):
    forward weights, grad_z and grad_gamma."""
    torch.manual_seed(seed)
    z_rep = np.repeat(Z, B, axis=0)
    w_rep = _t(np.repeat(WAGG, B, axis=0))
    fwd = np.zeros_like(z_rep, dtype=np.float64)
    g_z = np.zeros_like(z_rep, dtype=np.float64)
    g_gam = 0.0
    for _ in range(R):
        z = _t(z_rep, grad=True)
        gamma = _t(GAMMA, grad=True)
        w = fn_cls.apply(z, S, gamma, noise_type, False)
        (w * w_rep).sum().backward()
        fwd += w.detach().numpy()
        g_z += z.grad.numpy()
        g_gam += float(gamma.grad)
    out[f"{tag}_fwd"] = (fwd / R).mean(0, keepdims=True).astype(np.float32)
    out[f"{tag}_grad_z"] = (
        (g_z / R).mean(0, keepdims=True).astype(np.float32))
    out[f"{tag}_grad_gamma"] = np.float32(g_gam / (R * B))


mc_argmax(sa.randomArgmax, "argmax_gaussian", "gaussian", seed=4)
mc_argmax(sa.randomArgmax, "argmax_cauchy", "cauchy", seed=5)


def mc_agg(cls, tag, seed):
    """Large-S estimate through the FULL aggregate() (preamble + argmax):
    grads reach zbuf, prob_map, gamma, alpha."""
    torch.manual_seed(seed)
    zbuf_rep = np.repeat(ZBUF, B, axis=0)
    prob_rep = np.repeat(PROB, B, axis=0)
    mask_rep = _t(np.repeat(MASK, B, axis=0))
    w_rep = _t(np.repeat(WAGG, B, axis=0))
    fwd = np.zeros((B,) + WAGG.shape[1:], dtype=np.float64)
    g_zbuf = np.zeros_like(zbuf_rep, dtype=np.float64)
    g_prob = np.zeros_like(prob_rep, dtype=np.float64)
    g_gam = 0.0
    g_alp = 0.0
    for _ in range(R):
        zbuf = _t(zbuf_rep, grad=True)
        prob = _t(prob_rep, grad=True)
        m = cls(nb_samples=S, gamma=AGG_GAMMA, alpha=AGG_ALPHA)
        w = m.aggregate(zbuf, ZFAR, ZNEAR, prob, mask_rep)
        (w * w_rep).sum().backward()
        fwd += w.detach().numpy()
        g_zbuf += zbuf.grad.numpy()
        g_prob += prob.grad.numpy()
        g_gam += float(m.gamma.grad)
        g_alp += float(m.alpha.grad)
    out[f"{tag}_fwd"] = (fwd / R).mean(0, keepdims=True).astype(np.float32)
    out[f"{tag}_grad_zbuf"] = (
        (g_zbuf / R).mean(0, keepdims=True).astype(np.float32))
    out[f"{tag}_grad_prob"] = (
        (g_prob / R).mean(0, keepdims=True).astype(np.float32))
    out[f"{tag}_grad_gamma"] = np.float32(g_gam / (R * B))
    out[f"{tag}_grad_alpha"] = np.float32(g_alp / (R * B))


mc_agg(sa.GaussianAgg, "gaussianagg", seed=6)

os.makedirs(os.path.dirname(OUT), exist_ok=True)
np.savez_compressed(OUT, **out)
print(f"wrote {os.path.abspath(OUT)} with {len(out)} arrays")
for k in sorted(out):
    v = np.asarray(out[k])
    print(f"  {k}: shape={v.shape} mean={v.mean():+.4f}")
