"""MXU-precision lint: geometry-path matmuls must pin ``precision=``.

The TPU MXU's DEFAULT matmul pass rounds f32 operands to bfloat16 (~2e-3
relative) — enough that an identity rotation moved every vertex by more
than a sigma=1e-3 blur band (the round-4 bug at ``transforms.py:32-39``
that invalidated a whole round of on-chip artifacts).  The CPU pytest
suite cannot observe that numerically (no MXU pass on CPU), so this test
gates it STRUCTURALLY: every matmul-family call in the geometry modules
must carry an explicit ``precision=`` keyword, and the ``@`` operator
(which cannot carry one) is banned outright in those modules.

Counterpart at runtime: ``bench.py``'s ``check_geometry_identity`` /
``check_camera_projection`` pins run compiled on the real chip.
"""

import ast
import os

import pertrenderer_tpu

_PKG = os.path.dirname(pertrenderer_tpu.__file__)

# The modules whose outputs feed the rasterizer/estimators in f32 geometry
# or color space — exactly the class of code the round-4 bug lived in.
GEOMETRY_MODULES = [
    "transforms.py",
    "cameras.py",
    "textures.py",
    "losses.py",
    "shading.py",
    "blending.py",
    "lights.py",
    "structures.py",
    "io.py",
    os.path.join("experiments", "harness.py"),
    os.path.join("models", "shaders.py"),
    os.path.join("models", "renderer.py"),
]

# Matmul-family callables that lower to the MXU and accept ``precision=``.
_MATMUL_NAMES = {"matmul", "einsum", "dot", "tensordot", "vecdot",
                 "dot_general"}


def _call_name(node):
    if isinstance(node.func, ast.Attribute):
        return node.func.attr
    if isinstance(node.func, ast.Name):
        return node.func.id
    return ""


def find_unpinned_matmuls(source, filename="<src>"):
    """All matmul-family sites in ``source`` lacking ``precision=`` (and
    every use of the ``@`` operator, which cannot be annotated)."""
    tree = ast.parse(source, filename=filename)
    bad = []
    for node in ast.walk(tree):
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.MatMult):
            bad.append((filename, node.lineno,
                        "matmul operator '@' cannot pin precision; use "
                        "jnp.matmul(..., precision=...)"))
        elif isinstance(node, ast.Call):
            name = _call_name(node)
            if name in _MATMUL_NAMES and not any(
                    kw.arg == "precision" for kw in node.keywords):
                bad.append((filename, node.lineno,
                            f"{name}(...) without precision="))
    return bad


def test_geometry_matmuls_pin_precision():
    bad = []
    for rel in GEOMETRY_MODULES:
        path = os.path.join(_PKG, rel)
        with open(path) as f:
            bad.extend(find_unpinned_matmuls(f.read(), rel))
    assert not bad, (
        "unannotated MXU matmuls in geometry modules (the default TPU "
        "matmul pass rounds f32 operands to bfloat16):\n"
        + "\n".join(f"  {f}:{ln}: {msg}" for f, ln, msg in bad))


def test_lint_catches_deliberate_regression():
    """Removing one ``precision=`` (or writing ``a @ b``) must fail CI."""
    assert find_unpinned_matmuls(
        "import jax.numpy as jnp\n"
        "def f(points, R, T):\n"
        "    return jnp.matmul(points, R) + T\n")
    assert find_unpinned_matmuls(
        "def f(points, R, T):\n"
        "    return points @ R + T\n")
    assert find_unpinned_matmuls(
        "import jax.numpy as jnp\n"
        "def f(T, R):\n"
        "    return -jnp.einsum('nj,nkj->nk', T, R)\n")
    # ...and stays quiet on the pinned forms.
    assert not find_unpinned_matmuls(
        "import jax, jax.numpy as jnp\n"
        "def f(points, R, T):\n"
        "    return jnp.matmul(points, R,\n"
        "                      precision=jax.lax.Precision.HIGHEST) + T\n")
