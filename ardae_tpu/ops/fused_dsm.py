"""Pallas TPU kernel: fused denoising-score-matching loss for the res-style
conditional AR-DAE (the PHASE-A hot op; SURVEY.md 7.5).

Computes, in ONE kernel pass over row tiles with every weight resident in
VMEM:

    inp   = MLP_enc(x_bar)                        (E layers, act everywhere)
    h0    = act(inp @ W_h + sigma @ w_s + b0 + ctx_l0_rows)
    h_k   = act(h_{k-1} @ W_k + b_k)              (H hidden layers)
    r     = h_H @ W_out + b_out
    loss  = mean((sigma * r + eps)^2)

and a custom-VJP backward kernel that recomputes activations per tile and
accumulates parameter gradients across (sequential) grid steps — no
intermediate activation ever round-trips through HBM. Latents are detached
in phase A (reference ivae_ardae.py:750), so no input gradients are needed.

The XLA path (models/cdae/cardae.cdae_loss) remains the reference
implementation; this kernel is validated against it in tests (loss + every
parameter gradient, incl. the context path via the VJP's d/d(ctx_rows)) and
enabled via StepConfig(use_pallas=True).

Measured (1x TPU v5e, h=256, L=5, bsz*ssz=80k rows, value_and_grad):
  XLA 8.32 ms   |   this kernel 5.96 ms   (1.40x)
Inside the full jitted joint step the end-to-end time is neutral (XLA
overlaps surrounding work across the custom-call boundary), so the default
is off; h=512 configs exceed VMEM (weights + grad accumulators ~21 MB) and
always fall back to XLA — see supports_fused_dsm.
"""

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act(name):
    if name == "softplus":
        return jax.nn.softplus, jax.nn.sigmoid
    if name == "relu":
        return jax.nn.relu, lambda h_pre: (h_pre > 0).astype(h_pre.dtype)
    if name == "tanh":
        return jnp.tanh, lambda h_pre: 1.0 - jnp.tanh(h_pre) ** 2
    raise NotImplementedError(name)


def _flatten_params(params):
    """CARDAE param dict (res-style, conditional, split trunk) ->
    (enc_layers, l0, hidden_layers, out) weight lists."""
    p = params["params"]
    enc = []
    if "inp_encode" in p:
        pe = p["inp_encode"]
        keys = sorted(k for k in pe if k.startswith("layers_"))
        for k in keys:
            enc.append((pe[k]["kernel"], pe[k]["bias"]))
        enc.append((pe["fc"]["kernel"], pe["fc"]["bias"]))
    l0 = (p["dae_l0_row"]["kernel"], p["dae_l0_row"]["bias"])
    trunk = p["dae"]
    hid = []
    keys = sorted(k for k in trunk if k.startswith("layers_"))
    for k in keys:
        hid.append((trunk[k]["kernel"], trunk[k]["bias"]))
    out = (trunk["fc"]["kernel"], trunk["fc"]["bias"])
    return enc, l0, hid, out


def _treeify(enc, l0, hid, out):
    flat = []
    for w, b in enc:
        flat += [w, b]
    flat += [l0[0], l0[1]]
    for w, b in hid:
        flat += [w, b]
    flat += [out[0], out[1]]
    return flat


def _forward_tile(refs, n_enc, n_hid, act):
    """Run the fused chain on one row tile; returns (r, cache of pre-acts)."""
    afun, _ = _act(act)
    idx = 0
    xbar = refs["xbar"][:]
    sigma = refs["sigma"][:]
    h = xbar
    cache = []
    for _ in range(n_enc):
        w, b = refs["ws"][idx], refs["ws"][idx + 1]
        idx += 2
        pre = jnp.dot(h, w[:], preferred_element_type=jnp.float32) + b[:]
        cache.append((h, pre))
        h = afun(pre)
    # split first trunk layer: W rows [0:h) for features, [h] for sigma
    w0, b0 = refs["ws"][idx], refs["ws"][idx + 1]
    idx += 2
    d_in = h.shape[-1]
    pre = (
        jnp.dot(h, w0[: d_in, :], preferred_element_type=jnp.float32)
        + sigma * w0[d_in, :][None, :]
        + b0[:]
        + refs["ctx"][:]
    )
    cache.append((h, pre))
    h = afun(pre)
    for _ in range(n_hid):
        w, b = refs["ws"][idx], refs["ws"][idx + 1]
        idx += 2
        pre = jnp.dot(h, w[:], preferred_element_type=jnp.float32) + b[:]
        cache.append((h, pre))
        h = afun(pre)
    w, b = refs["ws"][idx], refs["ws"][idx + 1]
    r = jnp.dot(h, w[:], preferred_element_type=jnp.float32) + b[:]
    cache.append((h, None))
    return r, cache


def _make_refs(xbar_ref, eps_ref, sigma_ref, ctx_ref, w_refs):
    return {"xbar": xbar_ref, "eps": eps_ref, "sigma": sigma_ref,
            "ctx": ctx_ref, "ws": w_refs}


def _fwd_kernel(n_enc, n_hid, act, n_total, xbar_ref, eps_ref, sigma_ref,
                ctx_ref, *rest):
    w_refs = rest[:-1]
    loss_ref = rest[-1]
    refs = _make_refs(xbar_ref, eps_ref, sigma_ref, ctx_ref, w_refs)
    r, _ = _forward_tile(refs, n_enc, n_hid, act)
    resid = sigma_ref[:] * r + eps_ref[:]
    partial = jnp.sum(resid * resid)

    @pl.when(pl.program_id(0) == 0)
    def _():
        loss_ref[0, 0] = 0.0

    loss_ref[0, 0] += partial / n_total


def _bwd_kernel(n_enc, n_hid, act, n_total, xbar_ref, eps_ref, sigma_ref,
                ctx_ref, *rest):
    n_w = 2 * (n_enc + n_hid + 2)
    w_refs = rest[:n_w]
    grad_refs = rest[n_w:-1]
    dctx_ref = rest[-1]
    afun, dfun = _act(act)
    refs = _make_refs(xbar_ref, eps_ref, sigma_ref, ctx_ref, w_refs)
    r, cache = _forward_tile(refs, n_enc, n_hid, act)
    sigma = sigma_ref[:]
    resid = sigma * r + eps_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for g in grad_refs:
            g[...] = jnp.zeros(g.shape, jnp.float32)

    # d loss / d r; the scalar upstream cotangent is applied outside
    dr = 2.0 * sigma * resid / n_total

    # walk the chain backwards accumulating dW, db
    idx_w = 2 * (n_enc + 1 + n_hid)  # start of out layer in flat list
    h_out, _ = cache[-1]
    grad_refs[idx_w][...] += jnp.dot(h_out.T, dr, preferred_element_type=jnp.float32)
    grad_refs[idx_w + 1][...] += jnp.sum(dr, axis=0)
    dh = jnp.dot(dr, w_refs[idx_w][:].T, preferred_element_type=jnp.float32)

    for layer in range(n_hid - 1, -1, -1):
        idx_w = 2 * (n_enc + 1 + layer)
        h_in, pre = cache[n_enc + 1 + layer]
        dpre = dh * dfun(pre)
        grad_refs[idx_w][...] += jnp.dot(h_in.T, dpre, preferred_element_type=jnp.float32)
        grad_refs[idx_w + 1][...] += jnp.sum(dpre, axis=0)
        dh = jnp.dot(dpre, w_refs[idx_w][:].T, preferred_element_type=jnp.float32)

    # split trunk layer 0 (the ctx contribution enters pre-activation here)
    idx_w = 2 * n_enc
    h_in, pre = cache[n_enc]
    dpre = dh * dfun(pre)
    dctx_ref[...] = dpre
    d_in = h_in.shape[-1]
    dW = jnp.dot(h_in.T, dpre, preferred_element_type=jnp.float32)
    dws = jnp.sum(sigma * dpre, axis=0)
    grad_refs[idx_w][...] += jnp.concatenate([dW, dws[None, :]], axis=0)
    grad_refs[idx_w + 1][...] += jnp.sum(dpre, axis=0)
    dh = jnp.dot(dpre, w_refs[idx_w][: d_in, :].T,
                 preferred_element_type=jnp.float32)

    for layer in range(n_enc - 1, -1, -1):
        idx_w = 2 * layer
        h_in, pre = cache[layer]
        dpre = dh * dfun(pre)
        grad_refs[idx_w][...] += jnp.dot(h_in.T, dpre, preferred_element_type=jnp.float32)
        grad_refs[idx_w + 1][...] += jnp.sum(dpre, axis=0)
        if layer > 0:
            dh = jnp.dot(dpre, w_refs[idx_w][:].T,
                         preferred_element_type=jnp.float32)


def _row_spec(cols, tile):
    return pl.BlockSpec((tile, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_dsm(n_enc, n_hid, act, tile, interpret, flat_ws, xbar, eps, sigma,
               ctx_rows):
    loss, _ = _fused_dsm_fwd(n_enc, n_hid, act, tile, interpret, flat_ws,
                             xbar, eps, sigma, ctx_rows)
    return loss


def _fused_dsm_fwd(n_enc, n_hid, act, tile, interpret, flat_ws, xbar, eps,
                   sigma, ctx_rows):
    n, d = xbar.shape
    n_total = float(n * d)
    grid = (n // tile,)
    kernel = functools.partial(_fwd_kernel, n_enc, n_hid, act, n_total)
    loss = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _row_spec(d, tile), _row_spec(d, tile), _row_spec(1, tile),
            _row_spec(ctx_rows.shape[-1], tile),
        ] + [_full_spec(w.shape) for w in flat_ws],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(xbar, eps, sigma, ctx_rows, *flat_ws)[0, 0]
    return loss, (flat_ws, xbar, eps, sigma, ctx_rows)


def _fused_dsm_bwd(n_enc, n_hid, act, tile, interpret, res, g):
    flat_ws, xbar, eps, sigma, ctx_rows = res
    n, d = xbar.shape
    n_total = float(n * d)
    grid = (n // tile,)
    kernel = functools.partial(_bwd_kernel, n_enc, n_hid, act, n_total)
    h_ctx = ctx_rows.shape[-1]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _row_spec(d, tile), _row_spec(d, tile), _row_spec(1, tile),
            _row_spec(h_ctx, tile),
        ] + [_full_spec(w.shape) for w in flat_ws],
        out_specs=[_full_spec(w.shape) for w in flat_ws]
        + [_row_spec(h_ctx, tile)],
        out_shape=[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat_ws]
        + [jax.ShapeDtypeStruct((n, h_ctx), jnp.float32)],
        interpret=interpret,
    )(xbar, eps, sigma, ctx_rows, *flat_ws)
    w_grads = [g * gw for gw in outs[:-1]]
    dctx = g * outs[-1]
    zeros = jnp.zeros_like
    return (w_grads, zeros(xbar), zeros(eps), zeros(sigma), dctx)


_fused_dsm.defvjp(_fused_dsm_fwd, _fused_dsm_bwd)


def supports_fused_dsm(module, n_rows, tile=256):
    """The kernel covers the res-style, conditional, sigma-conditioned,
    enc_input=True CARDAE with a tile-divisible row count, and only while
    weights + gradient accumulators + activation caches fit VMEM (~16 MB):
    h_dim <= 256 in practice (h=512 configs overflow by ~6 MB and fall back
    to the XLA path)."""
    return (
        module.score_type == "res"
        and module.conditional
        and module.sigma_conditioned
        and module.enc_input
        and module.h_dim <= 256
        and n_rows % tile == 0
    )


def fused_cdae_dsm_loss(module, params, key, latent, context, std,
                        tile=512, interpret=False):
    """Drop-in replacement for cdae_loss (gaussian noise) on supported
    configs; identical math, fused execution.

    latent: (bsz, ssz, d); context: (bsz, ctx_dim); std: (bsz, ssz, 1).
    Parameter gradients flow through the custom VJP; latent/context/std are
    treated as constants (phase A detaches them — reference ivae_ardae.py:750).
    """
    bsz, ssz, d = latent.shape
    n = bsz * ssz
    if n % tile:
        raise ValueError(f"rows {n} not divisible by tile {tile}")
    x = latent.reshape(n, d)
    sigma = jnp.broadcast_to(jnp.asarray(std, latent.dtype), (bsz, ssz, 1))
    sigma = sigma.reshape(n, 1)
    eps = jax.random.normal(key, (n, d), latent.dtype)
    xbar = x + sigma * eps

    from ardae_tpu.models.cdae.cardae import _ctx_l0

    # ctx path stays in XLA (per-item, cheap) but remains differentiable:
    # the kernel's VJP emits d/d(ctx_rows), which chains into the ctx params.
    ctx_l0 = _ctx_l0(module, params, context)  # (bsz, h)
    ctx_rows = jnp.broadcast_to(
        ctx_l0[:, None, :], (bsz, ssz, ctx_l0.shape[-1])
    ).reshape(n, -1)

    enc, l0, hid, out = _flatten_params(params)
    n_enc, n_hid = len(enc), len(hid)
    flat_ws = _treeify(enc, l0, hid, out)

    loss = _fused_dsm(n_enc, n_hid, module.nonlinearity, tile, interpret,
                      flat_ws, xbar,
                      eps.astype(jnp.float32),
                      sigma.astype(jnp.float32),
                      ctx_rows.astype(jnp.float32))
    return loss
