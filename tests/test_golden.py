"""Golden-image regression: a fixed synthetic scene rendered + differentiated
through the tiled pipeline must keep producing byte-identical-ish numerics.

SURVEY.md §4 calls for golden-image tests on the synthetic config
(BASELINE.json configs[0] scaled down for CI speed). The golden file pins
rgb/alpha AND parameter-gradient fingerprints, so any numeric drift in
projection, binning, or compositing shows up here even when the
implementation-vs-oracle equivalence tests still pass (those compare the
implementations to each other, not to history).

Regenerate deliberately after an intended numeric change:

    GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q
"""
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from test_rasterize import full_pipeline, make_scene

GOLDEN = Path(__file__).parent / "golden" / "render_2k_200.npz"


def _compute():
    means, scales, quats, colors, opac, cam = make_scene(
        n=2000, seed=7, w=200, h=200)

    def loss_fn(means, scales, quats, colors, opac):
        img, alpha = full_pipeline(means, scales, quats, colors, opac, cam,
                                   max_pairs=1 << 16)
        return jnp.abs(img - 0.5).mean(), (img, alpha)

    (_, (img, alpha)), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True)(
        means, scales, quats, colors, opac)
    out = {
        "rgb": np.asarray(img, np.float32),
        "alpha": np.asarray(alpha, np.float32),
    }
    for name, g in zip(("means", "scales", "quats", "colors", "opac"), grads):
        out[f"grad_{name}_norm"] = np.float32(jnp.linalg.norm(g))
        out[f"grad_{name}_head"] = np.asarray(g.ravel()[:64], np.float32)
    return out


def test_golden_render_and_grads():
    got = _compute()
    if os.environ.get("GOLDEN_REGEN") == "1" or not GOLDEN.exists():
        GOLDEN.parent.mkdir(exist_ok=True)
        np.savez_compressed(GOLDEN, **got)
        assert GOLDEN.exists()
        return
    want = np.load(GOLDEN)
    assert set(want.files) == set(got)
    # Forward image: tight; coverage must be non-trivial for the test to
    # mean anything.
    assert float(got["alpha"].max()) > 0.5
    np.testing.assert_allclose(got["rgb"], want["rgb"], atol=2e-5)
    np.testing.assert_allclose(got["alpha"], want["alpha"], atol=2e-5)
    # Gradients: norms pin global scale, heads pin elementwise layout.
    for name in ("means", "scales", "quats", "colors", "opac"):
        n_want = float(want[f"grad_{name}_norm"])
        assert n_want > 0.0
        np.testing.assert_allclose(float(got[f"grad_{name}_norm"]), n_want,
                                   rtol=1e-4, err_msg=name)
        np.testing.assert_allclose(got[f"grad_{name}_head"],
                                   want[f"grad_{name}_head"],
                                   atol=1e-5, rtol=1e-4, err_msg=name)
