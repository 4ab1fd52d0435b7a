"""Pallas TPU kernel: fused denoising-score-matching loss AND parameter
gradients for the GRADIENT-style conditional AR-DAE (score = d/dx of a scalar
energy MLP — reference models/graddae/mlp.py:341-483).

The XLA path (models/cdae/cardae.cdae_loss with score_type='grad') computes

    s  = -d e(x_bar, ctx, sigma) / d x_bar          (reverse pass)
    L  = mean((sigma * s + eps)^2)
    dL/dtheta                                       (second order)

as ~7 chained matmul fusions per layer, each round-tripping (rows, h)
activations through HBM — measured HBM-bound at ~2x the pure-IO floor
(profiler, CLAUDE.md). This kernel runs the WHOLE second-order computation
per row tile with weights and every intermediate resident in VMEM:

  1. forward chain            pre-activations q (enc), p (trunk), energy e
  2. input-gradient chain     g = de/dx_bar, score s = -g
  3. loss residual            R = sigma*s + eps, L += sum(R^2)/N
  4. tangent (JVP) chain      along w = -dL/ds = -2*sigma*R/N
  5. reverse over (1)+(4)     parameter grads + d/d(ctx_rows)

Correctness rests on the exact identity dL/dtheta = d/dtheta sum_rows
JVP(e; w) with w held constant (product rule: dL = v.ds with v = 2sigma R/N,
and v.s == -JVP(e; w)); the reverse pass therefore carries adjoints for BOTH
the primal (A) and tangent (At) chains, with the phi''(pre)*tangent coupling
term. Validated against jax.grad of the XLA path in tests (fp32 exact, bf16
loose) — tests/test_fused_dsm.py.

VMEM discipline (the first cut OOM'd at 66 MB / 16 MB): only the
PRE-activation chains (q, p, tq, tp) are stored, in the compute dtype;
activations phi(.) and the derivative factors phi'/phi'' are recomputed on
the fly wherever the reverse pass needs them. Matmuls accumulate fp32
(preferred_element_type); gradient accumulators are fp32 across the
sequential grid steps.

MEASURED VERDICT (1x v5e, canonical shape h=256 L=5, 80k rows,
value_and_grad):
    XLA fp32 20.1 ms | this kernel fp32 53/49 ms (tile 128/256)
    XLA bf16 11.1 ms | this kernel bf16 46 ms
The straight-line Mosaic kernel holds a ~58 MB VMEM working set (needs
vmem_limit_bytes raised), which kills cross-grid-step pipelining; XLA's
pipelined per-layer fusions win decisively. ALSO: in bf16 the second-order
chain's tiny tangent magnitudes (w ~ 2*sigma*R/N ~ 1e-9 early in training)
lose to rounding noise and the returned gradients are garbage-scale — only
compute_dtype='float32' is numerically trustworthy (exact vs jax.grad,
tests). Consequently the train step does NOT dispatch here; the kernel is
kept as a correctness-validated baseline for a future pipelined (fori_loop
+ stacked-weight scratch, double-buffered DMA) rework — see CLAUDE.md.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _acts(name):
    """phi, phi', phi'' as functions of the PRE-activation."""
    if name == "softplus":
        def d2(p):
            s = jax.nn.sigmoid(p)
            return s * (1.0 - s)

        return jax.nn.softplus, jax.nn.sigmoid, d2
    if name == "relu":
        return (jax.nn.relu,
                lambda p: (p > 0).astype(p.dtype),
                lambda p: jnp.zeros_like(p))
    if name == "tanh":
        def d1(p):
            return 1.0 - jnp.tanh(p) ** 2

        def d2(p):
            t = jnp.tanh(p)
            return -2.0 * t * (1.0 - t * t)

        return jnp.tanh, d1, d2
    raise NotImplementedError(name)


def flatten_grad_params(params):
    """Grad-style CARDAE param dict -> flat [W,b,...] list ordered as
    enc layers..., trunk l0_row, trunk hidden layers..., out layer.

    Mirrors ops/fused_dsm._flatten_params but for the 'neglogprob' trunk
    (out_dim=1)."""
    p = params["params"]
    flat = []
    n_enc = 0
    if "inp_encode" in p:
        pe = p["inp_encode"]
        for k in sorted(k for k in pe if k.startswith("layers_")):
            flat += [pe[k]["kernel"], pe[k]["bias"]]
            n_enc += 1
        flat += [pe["fc"]["kernel"], pe["fc"]["bias"]]
        n_enc += 1
    l0 = p["neglogprob_l0_row"]
    flat += [l0["kernel"], l0["bias"]]
    trunk = p["neglogprob"]
    n_hid = 0
    for k in sorted(k for k in trunk if k.startswith("layers_")):
        flat += [trunk[k]["kernel"], trunk[k]["bias"]]
        n_hid += 1
    flat += [trunk["fc"]["kernel"], trunk["fc"]["bias"]]
    return flat, n_enc, n_hid


def _mm(a, w):
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


def _kernel(n_enc, n_hid, act, n_total, cdt, xbar_ref, eps_ref, sigma_ref,
            ctx_ref, *rest):
    n_w = 2 * (n_enc + n_hid + 2)
    w_refs = rest[:n_w]
    grad_refs = rest[n_w:n_w * 2]
    dctx_ref = rest[-2]
    loss_ref = rest[-1]
    phi, dphi, d2phi = _acts(act)

    def W(i):
        return w_refs[2 * i][:]          # already in compute dtype

    def B(i):
        return w_refs[2 * i + 1][:]      # fp32

    @pl.when(pl.program_id(0) == 0)
    def _():
        for g in grad_refs:
            g[...] = jnp.zeros(g.shape, jnp.float32)
        loss_ref[0, 0] = 0.0

    xbar = xbar_ref[:].astype(cdt)
    sigma = sigma_ref[:].astype(jnp.float32)  # (T, 1)
    eps = eps_ref[:].astype(jnp.float32)
    ctx_rows = ctx_ref[:].astype(jnp.float32)

    i0 = n_enc                       # flat index of trunk l0_row
    iout = i0 + 1 + n_hid            # flat index of the out layer
    w0 = W(i0)                       # (h_in + 1, h)
    d_in = w0.shape[0] - 1
    w_out = W(iout)                  # (h, 1)

    # recompute helpers (inputs to layer k of each chain)
    def a_in(i, q):                  # input to enc layer i
        return xbar if i == 0 else phi(q[i - 1].astype(jnp.float32)).astype(cdt)

    def h_in(j, p):                  # input to trunk layer j (j>=1) / out
        return phi(p[j - 1].astype(jnp.float32)).astype(cdt)

    def ta_in(i, q, tq, w_dir):      # tangent input to enc layer i
        if i == 0:
            return w_dir
        return (dphi(q[i - 1].astype(jnp.float32))
                * tq[i - 1].astype(jnp.float32)).astype(cdt)

    def th_in(j, p, tp):             # tangent input to trunk layer j / out
        return (dphi(p[j - 1].astype(jnp.float32))
                * tp[j - 1].astype(jnp.float32)).astype(cdt)

    # ---- 1. forward: store pre-activations only ----------------------------
    q = []
    cur = xbar
    for i in range(n_enc):
        pre = _mm(cur, W(i)) + B(i)
        q.append(pre.astype(cdt))
        cur = phi(pre).astype(cdt)
    p = []
    pre0 = (_mm(cur, w0[:d_in, :])
            + sigma * w0[d_in, :].astype(jnp.float32)[None, :]
            + B(i0) + ctx_rows)
    p.append(pre0.astype(cdt))
    cur = phi(pre0).astype(cdt)
    for j in range(n_hid):
        pre = _mm(cur, W(i0 + 1 + j)) + B(i0 + 1 + j)
        p.append(pre.astype(cdt))
        cur = phi(pre).astype(cdt)

    # ---- 2. input gradient g = de/dxbar ------------------------------------
    dh = jnp.broadcast_to(w_out[:, 0].astype(jnp.float32)[None, :],
                          (xbar.shape[0], w_out.shape[0]))
    for j in range(n_hid, 0, -1):
        dp = (dh * dphi(p[j].astype(jnp.float32))).astype(cdt)
        dh = _mm(dp, W(i0 + j).T)
    dp0 = (dh * dphi(p[0].astype(jnp.float32))).astype(cdt)
    da = _mm(dp0, w0[:d_in, :].T)
    for i in range(n_enc - 1, -1, -1):
        dq = (da * dphi(q[i].astype(jnp.float32))).astype(cdt)
        da = _mm(dq, W(i).T)
    g = da                                # (T, d) fp32 = de/dxbar

    # ---- 3. loss ------------------------------------------------------------
    resid = -sigma * g + eps              # sigma*s + eps, s = -g
    loss_ref[0, 0] += jnp.sum(resid * resid) / n_total
    w_dir = (-2.0 * sigma * resid / n_total).astype(cdt)  # tangent direction

    # ---- 4. tangent (JVP) chain along w_dir --------------------------------
    tq = []
    tcur = w_dir
    for i in range(n_enc):
        tpre = _mm(tcur, W(i))
        tq.append(tpre.astype(cdt))
        tcur = (dphi(q[i].astype(jnp.float32)) * tpre).astype(cdt)
    tp = [_mm(tcur, w0[:d_in, :]).astype(cdt)]
    for j in range(n_hid):
        tcur = (dphi(p[j].astype(jnp.float32))
                * tp[j].astype(jnp.float32)).astype(cdt)
        tp.append(_mm(tcur, W(i0 + 1 + j)).astype(cdt))
    # th_last = dphi(p[-1]) * tp[-1]; TE = th_last @ w_out

    # ---- 5. reverse over primal+tangent, seed d(TE)=1 per row ---------------
    th_last = th_in(n_hid + 1, p, tp)     # tangent input to the out layer
    grad_refs[2 * iout][...] += jnp.sum(
        th_last.astype(jnp.float32), axis=0, keepdims=True).T
    # (b_out has no tangent path: gradient stays zero)
    A = jnp.zeros((xbar.shape[0], w_out.shape[0]), jnp.float32)
    At = jnp.broadcast_to(w_out[:, 0].astype(jnp.float32)[None, :], A.shape)
    for j in range(n_hid, 0, -1):
        pf = p[j].astype(jnp.float32)
        d1 = dphi(pf)
        Atp = (At * d1).astype(cdt)
        Ap = (A * d1
              + At * d2phi(pf) * tp[j].astype(jnp.float32)).astype(cdt)
        k = i0 + j
        grad_refs[2 * k][...] += (_mm(h_in(j, p).T, Ap)
                                  + _mm(th_in(j, p, tp).T, Atp))
        grad_refs[2 * k + 1][...] += jnp.sum(Ap.astype(jnp.float32), axis=0)
        A = _mm(Ap, W(k).T)
        At = _mm(Atp, W(k).T)
    # trunk l0_row (sigma + ctx enter here)
    p0f = p[0].astype(jnp.float32)
    d1 = dphi(p0f)
    Atp0 = (At * d1).astype(cdt)
    Ap0 = (A * d1 + At * d2phi(p0f) * tp[0].astype(jnp.float32)).astype(cdt)
    e_out = a_in(n_enc, q)               # enc output (input to trunk l0)
    te_out = ta_in(n_enc, q, tq, w_dir)  # its tangent
    dW0 = _mm(e_out.T, Ap0) + _mm(te_out.T, Atp0)
    Ap0_f = Ap0.astype(jnp.float32)
    dwsig = jnp.sum(sigma * Ap0_f, axis=0)
    grad_refs[2 * i0][...] += jnp.concatenate([dW0, dwsig[None, :]], axis=0)
    grad_refs[2 * i0 + 1][...] += jnp.sum(Ap0_f, axis=0)
    dctx_ref[...] = Ap0_f
    A = _mm(Ap0, w0[:d_in, :].T)
    At = _mm(Atp0, w0[:d_in, :].T)
    for i in range(n_enc - 1, -1, -1):
        qf = q[i].astype(jnp.float32)
        d1 = dphi(qf)
        Atq = (At * d1).astype(cdt)
        Aq = (A * d1 + At * d2phi(qf) * tq[i].astype(jnp.float32)).astype(cdt)
        grad_refs[2 * i][...] += (_mm(a_in(i, q).T, Aq)
                                  + _mm(ta_in(i, q, tq, w_dir).T, Atq))
        grad_refs[2 * i + 1][...] += jnp.sum(Aq.astype(jnp.float32), axis=0)
        if i > 0:
            A = _mm(Aq, W(i).T)
            At = _mm(Atq, W(i).T)


def _row_spec(cols, tile):
    return pl.BlockSpec((tile, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _fused_dsm_grad(n_enc, n_hid, act, tile, interpret, cdt_name, flat_ws,
                    xbar, eps, sigma, ctx_rows):
    loss, _ = _fused_dsm_grad_fwd(n_enc, n_hid, act, tile, interpret,
                                  cdt_name, flat_ws, xbar, eps, sigma,
                                  ctx_rows)
    return loss


def _run(n_enc, n_hid, act, tile, interpret, cdt_name, flat_ws, xbar, eps,
         sigma, ctx_rows):
    n, d = xbar.shape
    n_total = float(n * d)
    grid = (n // tile,)
    cdt = jnp.dtype(cdt_name)
    h_ctx = ctx_rows.shape[-1]
    # weights (kernels) in compute dtype, biases fp32
    ws_cast = [w.astype(cdt) if w.ndim == 2 else w.astype(jnp.float32)
               for w in flat_ws]
    kernel = functools.partial(_kernel, n_enc, n_hid, act, n_total, cdt)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _row_spec(d, tile), _row_spec(d, tile), _row_spec(1, tile),
            _row_spec(h_ctx, tile),
        ] + [_full_spec(w.shape) for w in ws_cast],
        out_specs=[_full_spec(w.shape) for w in flat_ws]
        + [_row_spec(h_ctx, tile),
           pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat_ws]
        + [jax.ShapeDtypeStruct((n, h_ctx), jnp.float32),
           jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        interpret=interpret,
        # the straight-line second-order chain keeps ~4 pre-activation
        # chains live; raise the compiler's scoped-VMEM cap (default 16 MB)
        # toward the v5e physical VMEM (128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xbar, eps, sigma, ctx_rows, *ws_cast)
    w_grads, dctx, loss = outs[:-2], outs[-2], outs[-1][0, 0]
    return loss, (list(w_grads), dctx)


def _fused_dsm_grad_fwd(n_enc, n_hid, act, tile, interpret, cdt_name, flat_ws,
                        xbar, eps, sigma, ctx_rows):
    loss, (w_grads, dctx) = _run(n_enc, n_hid, act, tile, interpret, cdt_name,
                                 flat_ws, xbar, eps, sigma, ctx_rows)
    return loss, (w_grads, dctx, xbar, eps, sigma)


def _fused_dsm_grad_bwd(n_enc, n_hid, act, tile, interpret, cdt_name, res, g):
    w_grads, dctx, xbar, eps, sigma = res
    return ([g * gw for gw in w_grads], jnp.zeros_like(xbar),
            jnp.zeros_like(eps), jnp.zeros_like(sigma), g * dctx)


_fused_dsm_grad.defvjp(_fused_dsm_grad_fwd, _fused_dsm_grad_bwd)


def supports_fused_dsm_grad(module, n_rows, tile=256):
    """Grad-style, conditional, sigma-conditioned, enc_input CARDAE with a
    tile-divisible row count and h small enough for the VMEM working set
    (pre-activation chains + weights + fp32 grad accumulators):
    h <= 256 measured safe on v5e in bf16."""
    return (
        module.score_type == "grad"
        and module.conditional
        and module.sigma_conditioned
        and module.enc_input
        and module.h_dim <= 256
        and n_rows % tile == 0
    )


def fused_cdae_dsm_grad_loss(module, params, key, latent, context, std,
                             tile=256, interpret=False,
                             compute_dtype="bfloat16"):
    """Drop-in replacement for cdae_loss (gaussian noise, grad style) on
    supported configs: identical math, one fused second-order kernel.

    latent: (bsz, ssz, d); context: (bsz, ctx_dim); std: (bsz, ssz, 1).
    Parameter gradients flow through the custom VJP; the ctx encoder stays
    in XLA (per-item, cheap) and receives its gradient through d/d(ctx_rows).
    """
    bsz, ssz, d = latent.shape
    n = bsz * ssz
    if n % tile:
        # the grid would silently drop the tail rows AND leave their dctx
        # rows uninitialized — refuse instead (see supports_fused_dsm_grad)
        raise ValueError(f"rows {n} not divisible by tile {tile}")
    x = latent.reshape(n, d).astype(jnp.float32)
    sigma = jnp.broadcast_to(jnp.asarray(std, jnp.float32), (bsz, ssz, 1))
    sigma = sigma.reshape(n, 1)
    # draw in latent.dtype (same-key parity with cdae_loss, which samples in
    # the input dtype), then promote for the fp32 kernel math
    eps = jax.random.normal(key, (n, d), latent.dtype).astype(jnp.float32)
    xbar = x + sigma * eps

    from ardae_tpu.models.cdae.cardae import _ctx_l0

    ctx_l0 = _ctx_l0(module, params, context).astype(jnp.float32)  # (bsz, h)
    ctx_rows = jnp.broadcast_to(
        ctx_l0[:, None, :], (bsz, ssz, ctx_l0.shape[-1])
    ).reshape(n, -1)

    flat_ws, n_enc, n_hid = flatten_grad_params(params)
    flat_ws = [w.astype(jnp.float32) for w in flat_ws]
    return _fused_dsm_grad(n_enc, n_hid, module.nonlinearity, tile, interpret,
                           compute_dtype, flat_ws, xbar, eps, sigma, ctx_rows)
