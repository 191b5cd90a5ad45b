"""Golden parity against the ACTUAL reference implementation.

The reference's lifting modules (main/transforms/wavelets/{haar,cdf_97}.py)
import only numpy+torch, so when the reference tree is mounted we load them
directly (no code copied) and assert our jnp lifting reproduces their
outputs to float32 rounding.  Skipped when /root/reference is absent.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_WAVELETS = "/root/reference/main/transforms/wavelets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_WAVELETS), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def reference_modules():
    torch = pytest.importorskip("torch")
    pkg = types.ModuleType("refwav")
    pkg.__path__ = [REF_WAVELETS]
    sys.modules["refwav"] = pkg
    mods = {}
    for name in ("utils", "haar", "cdf_97"):
        spec = importlib.util.spec_from_file_location(
            f"refwav.{name}", os.path.join(REF_WAVELETS, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refwav.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods, torch


def test_haar_lifting_matches_reference(reference_modules, rng):
    mods, torch = reference_modules
    import jax.numpy as jnp

    from irw_tpu.ops.wavelets.lifting import haar_dwt2

    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    ref_ll, ref_lh, ref_hl, ref_hh = mods["haar"].fast_haar_2d_op(torch.from_numpy(x.copy()))
    ll, lh, hl, hh = haar_dwt2(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ll), ref_ll.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(lh), ref_lh.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(hl), ref_hl.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(hh), ref_hh.numpy(), atol=2e-6)


def test_cdf97_lifting_matches_reference(reference_modules, rng):
    mods, torch = reference_modules
    import jax.numpy as jnp

    from irw_tpu.ops.wavelets.lifting import cdf97_dwt2

    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    ref_ll, ref_lh, ref_hl, ref_hh = mods["cdf_97"].fast_cdf97_2d_op(torch.from_numpy(x.copy()))
    ll, lh, hl, hh = cdf97_dwt2(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ll), ref_ll.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lh), ref_lh.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hl), ref_hl.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hh), ref_hh.numpy(), atol=1e-5)


def test_pallas_kernels_match_reference(reference_modules, rng):
    """The fused Pallas kernels reproduce the reference's outputs too."""
    mods, torch = reference_modules
    import jax.numpy as jnp

    from irw_tpu.ops.wavelets import lifting_multi_level_pallas

    x = rng.randn(5, 32, 32).astype(np.float32)
    for basis, mod, fn in (
        ("haar", mods["haar"], "fast_haar_2d_op"),
        ("cdf97", mods["cdf_97"], "fast_cdf97_2d_op"),
    ):
        ref_ll, ref_lh, ref_hl, ref_hh = getattr(mod, fn)(
            torch.from_numpy(x.copy()).unsqueeze(1)
        )
        out = lifting_multi_level_pallas(jnp.asarray(x), levels=1, basis=basis, tile_n=4)
        np.testing.assert_allclose(np.asarray(out[:, 0]), ref_ll.numpy()[:, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[:, 1]), ref_lh.numpy()[:, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[:, 2]), ref_hl.numpy()[:, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[:, 3]), ref_hh.numpy()[:, 0], atol=1e-5)
