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


@pytest.fixture(scope="module")
def reference_rank_ap():
    torch = pytest.importorskip("torch")
    # the reference's utils chain imports omegaconf (absent) — stub it
    om = types.ModuleType("omegaconf")
    lc = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    lc.ListConfig = ListConfig
    om.listconfig = lc
    sys.modules.setdefault("omegaconf", om)
    sys.modules.setdefault("omegaconf.listconfig", lc)
    sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_srap", "/root/reference/main/losses/smooth_rank_ap.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        import main.utils as ref_lib
    finally:
        # don't let the reference tree shadow repo-root modules for later
        # test files (its evaluate.py/plot_exemples.py import faiss etc.)
        sys.path.remove("/root/reference")

    return mod, ref_lib, torch


@pytest.mark.parametrize("cls_name,kwargs", [
    ("HeavisideAP", {}),
    ("SmoothAP", {"tau": 0.01}),
    ("SupAP", {"tau": 0.01, "rho": 100.0, "delta": 0.05}),
])
def test_rank_ap_matches_reference(reference_rank_ap, cls_name, kwargs, rng):
    mod, ref_lib, torch = reference_rank_ap
    import jax.numpy as jnp

    from irw_tpu.losses import get_loss
    from irw_tpu.losses.base import LossContext
    from irw_tpu.utils.label_matrix import create_label_matrix

    emb = rng.randn(8, 16).astype(np.float32)
    labels = rng.randint(0, 3, 8)
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    scores = e @ e.T

    ref_loss = getattr(mod, cls_name)(return_type="mAP", **kwargs)
    ref_target = ref_lib.create_label_matrix(torch.from_numpy(labels)).float()
    ref_val = float(ref_loss(torch.from_numpy(scores.copy()), ref_target))

    ours = get_loss(cls_name, return_type="mAP", **kwargs)
    ctx = LossContext(
        scores=jnp.asarray(scores),
        label_matrix=create_label_matrix(jnp.asarray(labels)),
    )
    our_val = float(ours(ctx, None, None)[0])
    assert abs(ref_val - our_val) < 1e-5


@pytest.mark.parametrize("cls_name,kwargs", [
    ("HeavisideAP", {}),
    ("SmoothAP", {"tau": 0.01}),
    ("SupAP", {"tau": 0.01, "rho": 100.0, "delta": 0.05}),
])
def test_rank_ap_multilabel_matches_reference(reference_rank_ap, cls_name, kwargs, rng):
    """Multilabel (VOC/COCO-style) batches: step_rank's pos-pos mask is
    rel(i,j) & target[q,j], which differs from the single-label case —
    regression test for the broadcast-axis bug found by the round-1 advisor."""
    mod, ref_lib, torch = reference_rank_ap
    import jax
    import jax.numpy as jnp

    from irw_tpu.losses import get_loss
    from irw_tpu.losses.base import LossContext
    from irw_tpu.utils.label_matrix import create_label_matrix

    emb = rng.randn(8, 16).astype(np.float32)
    # multilabel: each sample has 1-3 of 5 labels
    labels = (rng.rand(8, 5) < 0.4).astype(np.float32)
    labels[np.arange(8), rng.randint(0, 5, 8)] = 1.0  # ensure non-empty
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    scores = e @ e.T

    ref_loss = getattr(mod, cls_name)(return_type="mAP", **kwargs)
    ref_target = ref_lib.create_label_matrix(torch.from_numpy(labels))
    ref_scores = torch.from_numpy(scores.copy()).requires_grad_(True)
    ref_val = ref_loss(ref_scores, ref_target)
    ref_val.backward()
    # HeavisideAP's custom backward returns None (zero) gradients
    ref_grad = (ref_scores.grad.numpy() if ref_scores.grad is not None
                else np.zeros_like(scores))

    ours = get_loss(cls_name, return_type="mAP", **kwargs)
    lm = create_label_matrix(jnp.asarray(labels))

    def f(s):
        return ours(LossContext(scores=s, label_matrix=lm), None, None)[0]

    our_val, our_grad = jax.value_and_grad(f)(jnp.asarray(scores))
    assert abs(float(ref_val) - float(our_val)) < 1e-5
    np.testing.assert_allclose(np.asarray(our_grad), ref_grad, atol=1e-5)


def test_rank_ap_general_matches_reference(reference_rank_ap, rng):
    """Non-square (memory) scores: our scan-based general path vs the
    reference's general_forward per-query loop."""
    mod, ref_lib, torch = reference_rank_ap
    import jax.numpy as jnp

    from irw_tpu.losses import get_loss
    from irw_tpu.losses.base import LossContext
    from irw_tpu.utils.label_matrix import create_label_matrix

    emb = rng.randn(6, 16).astype(np.float32)
    mem = rng.randn(20, 16).astype(np.float32)
    labels = rng.randint(0, 3, 6)
    mem_labels = rng.randint(0, 3, 20)
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    m = mem / np.linalg.norm(mem, axis=1, keepdims=True)
    scores = e @ m.T
    rel = (labels[:, None] == mem_labels[None, :]).astype(np.float32)

    ref_loss = mod.SmoothAP(tau=0.01, return_type="mAP")
    ref_val = float(ref_loss(torch.from_numpy(scores.copy()), torch.from_numpy(rel.copy())))

    ours = get_loss("SmoothAP", tau=0.01, return_type="mAP")
    ctx = LossContext(
        scores=jnp.asarray(scores),
        label_matrix=create_label_matrix(jnp.asarray(labels), jnp.asarray(mem_labels)),
    )
    our_val = float(ours(ctx, None, None)[0])
    assert abs(ref_val - our_val) < 1e-5


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_hashnet_matches_reference(rng):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from irw_tpu.losses import get_loss
    from irw_tpu.losses.base import LossContext

    ref_mod = _load_ref("ref_hashnet", "/root/reference/main/losses/hashnet_loss.py")
    u = rng.randn(8, 16).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[rng.randint(0, 3, 8)]
    ref = ref_mod.HashNetAdapter(embedding_size=16, alpha=0.1)
    ref_val = float(ref(torch.from_numpy(u.copy()), torch.from_numpy(y.copy())))
    ours = get_loss("HashNetLoss", embedding_size=16, alpha=0.1)
    our_val = float(
        ours(LossContext(embeddings=jnp.asarray(u), labels=jnp.asarray(y)),
             {}, ours.init_state())[0]
    )
    assert abs(ref_val - our_val) < 1e-4


def test_csq_matches_reference(rng):
    torch = pytest.importorskip("torch")
    pytest.importorskip("scipy")
    import jax.numpy as jnp

    from irw_tpu.losses import get_loss
    from irw_tpu.losses.base import LossContext

    ref_mod = _load_ref("ref_csq", "/root/reference/main/losses/csq_loss.py")
    u = rng.randn(8, 16).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[rng.randint(0, 3, 8)]
    ref = ref_mod.CSQAdapter(embedding_size=16, num_classes=3, lambda_param=1e-4,
                             is_multi_label=False)
    ref_val = float(ref(torch.from_numpy(u.copy()), torch.from_numpy(y.copy())))
    ours = get_loss("CSQLoss", embedding_size=16, num_classes=3, lambda_param=1e-4,
                    is_multi_label=False)
    our_val = float(
        ours(LossContext(embeddings=jnp.asarray(u), labels=jnp.asarray(y)), {}, {})[0]
    )
    assert abs(ref_val - our_val) < 1e-4


def test_xbm_behavior_matches_reference(rng):
    """Our index-keyed on-device XBM returns the same occupied memory
    contents as the reference's path-keyed dict (memory.py:11-60), for both
    unique and ring modes."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from irw_tpu.engine.xbm import XBM as OurXBM

    mod = _load_ref("ref_xbm", "/root/reference/main/engine/memory.py")

    # unique mode: repeated keys overwrite
    ref = mod.XBM(size=8, unique=True)
    ours = OurXBM(size=8, embedding_dim=4, unique=True)
    state = ours.init()
    for step in range(3):
        feats = rng.randn(3, 4).astype(np.float32)
        labels = np.array([step, step + 1, step + 2])
        idx = np.array([0, 1, 2]) if step < 2 else np.array([3, 4, 5])
        keys = [f"k{i}" for i in idx]
        ref_f, ref_l = ref(torch.from_numpy(feats.copy()), torch.from_numpy(labels.copy()), keys)
        state = ours.update(state, jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(idx))
    mem_f, mem_l, valid = ours.contents(state)
    ours_set = {tuple(np.round(r, 5)) for r, v in zip(np.asarray(mem_f), np.asarray(valid)) if v}
    ref_set = {tuple(np.round(r, 5)) for r in ref_f.numpy()}
    assert ours_set == ref_set
    assert sorted(np.asarray(mem_l)[np.asarray(valid)].tolist()) == sorted(ref_l.numpy().tolist())

    # ring mode: bounded FIFO — same surviving elements after overflow
    ref2 = mod.XBM(size=4, unique=False)
    ours2 = OurXBM(size=4, embedding_dim=2, unique=False)
    state2 = ours2.init()
    for step in range(3):
        feats = np.full((2, 2), step, np.float32)
        labels = np.array([step, step])
        ref_f2, ref_l2 = ref2(torch.from_numpy(feats.copy()), torch.from_numpy(labels.copy()))
        state2 = ours2.update(state2, jnp.asarray(feats), jnp.asarray(labels), jnp.asarray([0, 1]))
    mem_f2, mem_l2, valid2 = ours2.contents(state2)
    ours_vals = sorted(np.asarray(mem_f2)[np.asarray(valid2)][:, 0].tolist())
    ref_vals = sorted(ref_f2.numpy()[:, 0].tolist())
    assert ours_vals == ref_vals


# --- the 11 "dead code" lifting families --------------------------------------
# The reference modules import `wavelets.utils` / `vis_utils`
# (daub_4.py:3,10) which never resolve in the reference tree — loading them
# needs two sys.modules shims.  With those in place they run, and serve as
# the golden oracle for irw_tpu's declarative lifting engine.

FAMILY_CASES = [
    ("daub_4", "fast_daub4_2d_op", "daub4"),
    ("cdf_53", "fast_cdf53_2d_op", "cdf53"),
    ("coif_12", "fast_coif12_2d_op", "coif12"),
    ("bior_spline_33", "fast_biorspline33_2d_op", "bior33"),
    ("bior_spline_35", "fast_biorspline35_2d_op", "bior35"),
    ("bior_spline_37", "fast_biorspline37_2d_op", "bior37"),
    ("bior_spline_39", "fast_biorspline39_2d_op", "bior39"),
    ("bior_spline_48", "fast_biorspline48_2d_op", "bior48"),
    ("rev_bior_spline_33", "fast_revbiorspline33_2d_op", "rev_bior33"),
    ("rev_bior_spline_35", "fast_revbiorspline35_2d_op", "rev_bior35"),
    ("rev_bior_spline_37", "fast_revbiorspline37_2d_op", "rev_bior37"),
    ("rev_bior_spline_39", "fast_revbiorspline39_2d_op", "rev_bior39"),
    ("rev_bior_spline_48", "fast_revbiorspline48_2d_op", "rev_bior48"),
]


@pytest.fixture(scope="module")
def reference_family_modules():
    torch = pytest.importorskip("torch")
    # shim 1: `wavelets` package pointing at the reference tree
    wav_pkg = types.ModuleType("wavelets")
    wav_pkg.__path__ = [REF_WAVELETS]
    # shim 2: the missing vis_utils (only used under __main__)
    vis = types.ModuleType("vis_utils")
    vis.prepare_input_image = lambda *a, **k: (_ for _ in ()).throw(RuntimeError)
    vis.show_lifting_results = lambda *a, **k: None
    saved = {n: sys.modules.get(n) for n in ("wavelets", "wavelets.utils", "vis_utils")}
    sys.modules["wavelets"] = wav_pkg
    sys.modules["vis_utils"] = vis
    spec = importlib.util.spec_from_file_location(
        "wavelets.utils", os.path.join(REF_WAVELETS, "utils.py")
    )
    utils = importlib.util.module_from_spec(spec)
    sys.modules["wavelets.utils"] = utils
    spec.loader.exec_module(utils)
    wav_pkg.utils = utils
    mods = {"utils": utils}
    for name, _, _ in FAMILY_CASES:
        spec = importlib.util.spec_from_file_location(
            f"reffam_{name}", os.path.join(REF_WAVELETS, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mods[name] = mod
    yield mods, torch
    for n, m in saved.items():
        if m is None:
            sys.modules.pop(n, None)
        else:
            sys.modules[n] = m


@pytest.mark.parametrize("ref_name,ref_fn,basis", FAMILY_CASES)
def test_lifting_family_matches_reference(reference_family_modules, ref_name,
                                          ref_fn, basis, rng):
    mods, torch = reference_family_modules
    import jax.numpy as jnp

    from irw_tpu.ops.wavelets import lifting_dwt2

    mod = mods[ref_name]
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    out = getattr(mod, ref_fn)(
        torch.from_numpy(x.copy()),
        kernel=mod.DEFAULT_KERNEL,
        scale_1d_coeffs=True,
        scale_2d_coeffs=True,
        coeffs_scales_2d=mods["utils"].COEFFS_SCALES_2D,
        data_format="NCHW",
    )
    ref_ll, ref_lh, ref_hl, ref_hh = torch.chunk(out, 4, dim=1)
    ll, lh, hl, hh = lifting_dwt2(jnp.asarray(x), basis)
    np.testing.assert_allclose(np.asarray(ll), ref_ll.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lh), ref_lh.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(hl), ref_hl.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(hh), ref_hh.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# Samplers: bit-exact batch construction vs the actual reference modules
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def reference_samplers():
    """Load the REAL reference sampler classes (no code copied)."""
    torch = pytest.importorskip("torch")  # noqa: F841 — BatchSampler import
    # main.utils pulls omegaconf (absent from image) — stub what it needs
    om = types.ModuleType("omegaconf")
    lc = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    lc.ListConfig = ListConfig
    om.listconfig = lc
    sys.modules.setdefault("omegaconf", om)
    sys.modules.setdefault("omegaconf.listconfig", lc)
    sys.path.insert(0, "/root/reference")
    try:
        mods = {}
        for name in ("m_per_class_sampler", "hierarchical_sampler"):
            spec = importlib.util.spec_from_file_location(
                f"ref_{name}", f"/root/reference/main/samplers/{name}.py"
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            mods[name] = mod
    finally:
        sys.path.remove("/root/reference")
    return mods


class _FakeHierDS:
    """instance_dict / super_dict / super_labels shaped like BaseDataset."""

    def __init__(self, rng, n_supers=3, classes_per_super=5, spread=(3, 11)):
        self.instance_dict = {}
        self.super_dict = {}
        self.super_labels = []
        idx = 0
        cls = 0
        for s in range(n_supers):
            self.super_dict[s] = {}
            for _ in range(classes_per_super):
                n = int(rng.randint(*spread))
                members = list(range(idx, idx + n))
                self.instance_dict[cls] = members
                self.super_dict[s][cls] = members
                self.super_labels.extend([s] * n)
                idx += n
                cls += 1
        self.length = idx

    def __len__(self):
        return self.length


def test_m_per_class_sampler_bit_exact(reference_samplers, rng):
    from irw_tpu.samplers import MPerClassSampler

    ds = _FakeHierDS(rng, n_supers=2, classes_per_super=6, spread=(5, 21))
    ref_cls = reference_samplers["m_per_class_sampler"].MPerClassSampler
    ref = ref_cls(ds, batch_size=12, samples_per_class=4)  # init reshuffles
    np.random.seed(777)
    ref.reshuffle()

    ours = MPerClassSampler(ds, batch_size=12, samples_per_class=4, seed=777)
    ours.reshuffle(0)

    assert len(ours.batches) == len(ref.batches) > 3
    for a, b in zip(ours.batches, ref.batches):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_m_per_class_depletes_classes(reference_samplers, rng):
    """Epoch length comes from DEPLETION: every class feeds
    floor(len/spc) batch slots per epoch, each index at most once."""
    from irw_tpu.samplers import MPerClassSampler

    ds = _FakeHierDS(rng, n_supers=1, classes_per_super=4, spread=(16, 17))
    s = MPerClassSampler(ds, batch_size=8, samples_per_class=4, seed=0)
    s.reshuffle(0)
    # 4 classes × 16 instances, 2 classes/batch → 8 full batches
    assert len(s.batches) == 8
    flat = np.concatenate(s.batches)
    assert len(np.unique(flat)) == len(flat) == 64  # no repeats in epoch


def test_hierarchical_sampler_bit_exact(reference_samplers, rng):
    from irw_tpu.samplers import HierarchicalSampler

    ds = _FakeHierDS(rng, n_supers=3, classes_per_super=5, spread=(2, 9))
    ref_cls = reference_samplers["hierarchical_sampler"].HierarchicalSampler
    ref = ref_cls(ds, batch_size=12, samples_per_class=2,
                  batches_per_super_pair=3, nb_categories=2)
    np.random.seed(424)
    ref.reshuffle()

    ours = HierarchicalSampler(
        ds, batch_size=12, samples_per_class=2, batches_per_super_pair=3,
        nb_categories=2, seed=424, drop_incomplete=False,
    )
    ours.reshuffle(0)

    assert len(ours.batches) == len(ref.batches) == 3 * 3  # C(3,2) pairs
    for a, b in zip(ours.batches, ref.batches):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hierarchical_sampler_all_instances_mode(reference_samplers, rng):
    """samples_per_class=0 → every instance of each drawn class
    (hierarchical_sampler.py:44-45, 84)."""
    from irw_tpu.samplers import HierarchicalSampler

    ds = _FakeHierDS(rng, n_supers=2, classes_per_super=4, spread=(2, 5))
    ref_cls = reference_samplers["hierarchical_sampler"].HierarchicalSampler
    ref = ref_cls(ds, batch_size=12, samples_per_class=0,
                  batches_per_super_pair=2, nb_categories=2)
    np.random.seed(31)
    ref.reshuffle()

    ours = HierarchicalSampler(
        ds, batch_size=12, samples_per_class=0, batches_per_super_pair=2,
        nb_categories=2, seed=31, drop_incomplete=False,
    )
    ours.reshuffle(0)

    assert len(ours.batches) == len(ref.batches)
    for a, b in zip(ours.batches, ref.batches):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
