"""Tests for the parity-completing extras: jacobian clamping, torchkit
layers, distributions, categorical heads, logprob variants, StepLR."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ardae_tpu.core.distributions import (
    hyperspherical_uniform_entropy,
    hyperspherical_uniform_logprob,
    sample_hyperspherical_uniform,
)
from ardae_tpu.core.jacobian_clamping import (
    cond_jac_clamping_loss,
    jac_clamping_loss,
    minrelu,
)
from ardae_tpu.nn.heads import (
    CategoricalHead,
    sample_gumbel_softmax,
    sample_logistic_sigmoid,
)
from ardae_tpu.nn.torchkit_extras import CWNconv2d, CWNlinear, GatingLinear, WNBilinear
from ardae_tpu.train.optim import step_lr

KEY = jax.random.PRNGKey(0)


def test_minrelu():
    np.testing.assert_allclose(minrelu(jnp.array([-2.0, 0.0, 3.0])), [-2.0, 0.0, 0.0])


def test_jac_clamping_zero_for_expanding_map():
    """A map with Jacobian norm >= eta_min everywhere incurs zero penalty;
    a collapsing map incurs a positive one."""
    x = jax.random.normal(KEY, (16, 2))
    z = x / 3.0
    # f(z) = 3z: directional J^2 = 9 >= eta_min=1 -> no penalty
    loss = jac_clamping_loss(lambda zz: 3.0 * zz, KEY, x, z,
                             num_pert_samples=4, eta_min=1.0)
    assert float(loss) == 0.0
    # f(z) = 0.01 z: J^2 = 1e-4 < 1 -> positive penalty
    loss2 = jac_clamping_loss(lambda zz: 0.01 * zz, KEY, 0.01 * z, z,
                              num_pert_samples=4, eta_min=1.0)
    assert float(loss2) > 0.5


def test_cond_jac_clamping_runs():
    bsz, nz, zdim = 4, 3, 2
    ctx = jax.random.normal(KEY, (bsz, 5))
    z = jax.random.normal(KEY, (bsz * nz, zdim))
    x = 2.0 * z

    def fwd(ctx, z_rows, num_z, num_pert):
        return 2.0 * z_rows

    loss = cond_jac_clamping_loss(fwd, KEY, x, ctx, z, nz, 2, eta_min=1.0)
    assert float(loss) == 0.0


def test_hyperspherical_uniform():
    s = sample_hyperspherical_uniform(KEY, 3, 1000, dim=2)  # S^2 in R^3
    np.testing.assert_allclose(np.linalg.norm(np.asarray(s), axis=-1), 1.0,
                               atol=1e-5)
    # entropy of S^2 = log(4*pi)
    assert abs(hyperspherical_uniform_entropy(2) - np.log(4 * np.pi)) < 1e-6
    lp = hyperspherical_uniform_logprob(s, 2)
    np.testing.assert_allclose(lp, -np.log(4 * np.pi), atol=1e-6)


def test_torchkit_extras_shapes():
    x = jax.random.normal(KEY, (4, 6))
    ctx = jax.random.normal(KEY, (4, 3))
    m = CWNlinear(5)
    p = m.init(KEY, x, ctx)
    assert m.apply(p, x, ctx).shape == (4, 5)

    m2 = WNBilinear(7)
    p2 = m2.init(KEY, x, ctx)
    assert m2.apply(p2, x, ctx).shape == (4, 7)

    m3 = GatingLinear(5)
    p3 = m3.init(KEY, x)
    assert m3.apply(p3, x).shape == (4, 5)

    img = jax.random.normal(KEY, (2, 8, 8, 3))
    m4 = CWNconv2d(4, 3, 1, 1)
    p4 = m4.init(KEY, img, ctx[:2])
    assert m4.apply(p4, img, ctx[:2]).shape == (2, 8, 8, 4)


def test_categorical_and_relaxed_samples():
    h = jax.random.normal(KEY, (5, 10))
    head = CategoricalHead(4)
    p = head.init(KEY, h)
    logits = head.apply(p, h)
    assert logits.shape == (5, 4)
    gs = sample_gumbel_softmax(KEY, logits, temperature=0.5)
    np.testing.assert_allclose(np.asarray(gs.sum(-1)), 1.0, atol=1e-5)
    ls = sample_logistic_sigmoid(KEY, logits)
    assert ((np.asarray(ls) >= 0) & (np.asarray(ls) <= 1)).all()


def test_step_lr():
    sched = step_lr(0.1, step_size=10, gamma=0.5, min_lr=0.02)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(10)) == pytest.approx(0.05)
    assert float(sched(20)) == pytest.approx(0.025)
    assert float(sched(30)) == pytest.approx(0.02)  # floored


def test_logprob_variants_finite():
    from ardae_tpu.models.ivae import api as ivae_api
    from ardae_tpu.models.ivae.toy import ToyIPVAE

    model = ToyIPVAE(input_dim=2, noise_dim=2, h_dim=16, z_dim=2,
                     nonlinearity="tanh", num_hidden_layers=2, enc_type="concat")
    x = jax.random.normal(KEY, (3, 2))
    params = model.init(KEY, x, jnp.zeros((3, 2)))
    for fn in (ivae_api.logprob_kde, ivae_api.logprob_diag):
        lp = fn(model, params, KEY, x, sample_size=64)
        assert jnp.isfinite(lp), fn.__name__
    lp = ivae_api.logprob_prior(model, params, KEY, x, sample_size=256)
    assert jnp.isfinite(lp)


def test_logprob_kde_linear_gaussian_close_to_exact():
    """KDE variant on the analytic linear-Gaussian model: within ~0.2 nats."""
    from ardae_tpu.models.ivae import api as ivae_api
    from tests.test_eval import _LinearGaussianIVAE

    A = jnp.array([[0.5, 0.1], [-0.2, 0.3]])
    B = jnp.array([[1.0, 0.4], [-0.3, 0.8]])
    model = _LinearGaussianIVAE(A=A, B=B)
    params = {"params": {}}
    x = jnp.array([[0.7, -1.2], [1.5, 0.3]])
    lp = float(ivae_api.logprob_kde(model, params, KEY, x, sample_size=1024))
    from ardae_tpu.core.stats import mvn_logprob

    cov = B @ B.T + jnp.eye(2)
    exact = float(jnp.mean(mvn_logprob(x, jnp.zeros(2), jnp.linalg.cholesky(cov))))
    assert abs(lp - exact) < 0.2, (lp, exact)

def test_torchkit_sequential_plumbing():
    """Reshape/Slice/slicer/Lambda/ContextWrapper/SequentialFlow equivalents
    (reference models/layers2.py:373-462)."""
    import flax.linen as nn
    from ardae_tpu.nn.torchkit_extras import (
        ContextWrapper, Lambda, Reshape, SequentialFlow, Slice, slicer,
    )

    assert Reshape((2, 6)).apply({}, jnp.ones((3, 4))).shape == (2, 6)
    # the reference resconv decoder's crop idiom: slicer[:, :-1, :-1, :]
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    assert slicer[:, :-1, :-1, :].apply({}, x).shape == (1, 3, 3, 1)
    assert float(Lambda(jnp.sum).apply({}, jnp.ones((2, 3)))) == 6.0

    wrapped = ContextWrapper(Lambda(jnp.tanh))
    y, ctx = wrapped.apply({}, (jnp.zeros((2, 2)), jnp.ones((2, 1))))
    assert y.shape == (2, 2) and ctx.shape == (2, 1)

    # flow chain: two blocks that shift x and accumulate logdet
    class Shift(nn.Module):
        @nn.compact
        def __call__(self, inputs):
            x, logdet, ctx = inputs
            return x + 1.0, logdet + 2.0, ctx

    flow = SequentialFlow(blocks=(Shift(), Shift()), dim=3, context_dim=2)
    key = jax.random.PRNGKey(0)
    x, logdet, ctx = flow.apply({}, key, 5, method=flow.sample)
    assert x.shape == (5, 3) and ctx.shape == (5, 2)
    assert np.all(np.asarray(logdet) >= 4.0)  # U(0,1) seed + 2 + 2


def test_torch_adamw_parity():
    """torch_adamw must track torch.optim.AdamW step for step (the reference
    vendors this optimizer at utils/optim.py:111-215)."""
    import torch

    from ardae_tpu.train.optim import torch_adamw

    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(5)]

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = torch.optim.AdamW([tp], lr=1e-2, betas=(0.9, 0.999), eps=1e-8,
                             weight_decay=1e-2)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()

    tx = torch_adamw(1e-2, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def _run_ours(tx, p0, grads):
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return np.asarray(params["w"])


def test_torch_adam_parity_vs_reference_vendored():
    """torch_adam must track the reference's OWN vendored Adam
    (/root/reference/utils/optim.py:50-110 — eps outside sqrt, step_size
    carries sqrt(bc2)/bc1) step for step. This is flat-parity microdiff
    probe (b) of VERDICT r2 item 6: the model optimizer's update law is
    exactly the reference's, so it cannot explain the 0.098-nat residual."""
    import sys
    import types

    import torch

    # stub torchvision for the reference's utils package import chain
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    sys.path.insert(0, "/root/reference")
    try:
        from utils.optim import Adam as RefAdam
    finally:
        sys.path.remove("/root/reference")

    from ardae_tpu.train.optim import torch_adam

    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(7)]

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = RefAdam([tp], lr=1e-3, betas=(0.5, 0.999), eps=1e-8)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()

    ours = _run_ours(torch_adam(1e-3, b1=0.5, b2=0.999, eps=1e-8), p0, grads)
    np.testing.assert_allclose(ours, tp.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_torch_rmsprop_parity_vs_torch():
    """torch_rmsprop must track torch.optim.RMSprop (momentum=0.5, the cdae
    optimizer of every canonical config) step for step — eps OUTSIDE the
    sqrt, momentum applied to the scaled update. Flat-parity microdiff probe
    (b) of VERDICT r2 item 6 for the d-side optimizer."""
    import torch

    from ardae_tpu.train.optim import torch_rmsprop

    rng = np.random.default_rng(2)
    p0 = rng.normal(size=(6, 2)).astype(np.float32)
    grads = [rng.normal(size=(6, 2)).astype(np.float32) for _ in range(7)]

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = torch.optim.RMSprop([tp], lr=1e-4, momentum=0.5)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()

    ours = _run_ours(torch_rmsprop(1e-4, momentum=0.5), p0, grads)
    np.testing.assert_allclose(ours, tp.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_concat_encoder_init_law_matches_reference():
    """Flat-parity microdiff probe (b), init side: the mlp-concat encoder's
    layer fan-ins and init families must equal the reference ConcatEncoder
    (toy.py:154-192): every Linear U(+-1/sqrt(fan_in)) with the noise column
    inside the SAME fused first fc layer (fan_in = h_dim + noise_dim), and
    the output head re-initialized N(0,1) (reset_parameters: normal_ on
    weight only, bias left at the Linear default)."""
    import jax

    from ardae_tpu.models.ivae.toy import ToyIPVAE

    h, nd, zd = 64, 10, 2
    model = ToyIPVAE(input_dim=2, noise_dim=nd, h_dim=h, z_dim=zd,
                     num_hidden_layers=2, enc_type="concat", nonlinearity="relu")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 2)),
                        jnp.zeros((4, nd)))
    flat = {}
    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}")
        else:
            flat[prefix] = np.asarray(tree)
    walk(params)

    enc = {k: v for k, v in flat.items() if "/encode/" in k}
    # hidden fc layers: kernel (h+noise_dim, h) — the context (noise) column
    # is re-concatenated into EVERY layer (reference layers.py:700-724), so
    # each layer is ONE fused Linear with init bound 1/sqrt(h+nd)
    fused = [v for k, v in enc.items()
             if v.ndim == 2 and v.shape == (h + nd, h)]
    assert len(fused) == 2, \
        f"expected 2 fused hidden kernels: { {k: v.shape for k, v in enc.items()} }"
    bound = 1.0 / np.sqrt(h + nd)
    for k0 in fused:
        assert np.abs(k0).max() <= bound + 1e-6
        # uniform with that bound, not a narrower one: max |w| near the bound
        assert np.abs(k0).max() > 0.9 * bound
    # output head: Linear(h+nd -> z_dim), weight re-initialized N(0,1)
    # (reference toy.py reset_parameters: normal_ on fc.fc.weight only)
    heads = [v for k, v in enc.items()
             if v.ndim == 2 and v.shape == (h + nd, zd)]
    assert len(heads) == 1, {k: v.shape for k, v in enc.items()}
    w = heads[0]
    assert w.std() > 0.8  # N(0,1) over 148 draws; uniform would be ~0.067
