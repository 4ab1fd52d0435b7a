"""Aux-family head-to-head: REFERENCE hierarchical implicit VAE vs ardae_tpu.

Round-1 VERDICT item 2: on the canonical dbMNIST sweep the implicit-aux
models tie/lose to their Gaussian baselines and auxresconvct undergoes sigma
collapse as beta anneals; this harness proves (or disproves) that the
REFERENCE implementation behaves the same way on identical data + flags, at
toy scale where a CPU run is feasible.

Reference side (this script): the exact two-phase loop of
/root/reference/ivae_ardae.py:707-846 with cdae_ctx_type='hidden1a'
(:737-741), model auxmlp (models/ivae/auxtoy.py ImplicitPosteriorVAE),
cdae mlp-res (models/resdae/mlp.py ConditionalARDAE), beta annealed
0.0001 -> 1.0 over BETA_ANN steps (utils/msc.py:53-55), torch CPU.
Sigma trajectory (cur_mean_std, the collapse metric — driver :755) is
printed every 100 iters; final eval is the reference's OWN
logprob_w_cov_gaussian_posterior (auxtoy.py:295-361 — note its cov is
estimated from sample_size**2 implicit draws, a toy-aux quirk).

The ardae_tpu side is the CLI at IDENTICAL flags:

  python -m ardae_tpu.cli.ivae_ardae --no-cuda --dataset 25gaussians \
    --nheight 1 --nchannels 2 --model auxmlp --model-z-dim 2 \
    --model-h-dim 64 --model-n-layers 2 --model-nonlin softplus \
    --model-n-dim 10 --cdae mlp-res --cdae-h-dim 64 --cdae-n-layers 3 \
    --cdae-nonlin softplus --cdae-ctx-type hidden1a --train-batch-size 256 \
    --train-nz-cdae 64 --train-nz-model 1 --delta 0.1 --std-scale 100 \
    --m-optimizer adam --m-beta1 0.9 --d-optimizer rmsprop --d-momentum 0.9 \
    --m-lr 0.001 --d-lr 0.0001 --beta-init 0.0001 --beta-fin 1.0 \
    --beta-annealing 2000 --epochs 9 --max-iters 4000 --toy-train-size \
    200000 --iws-samples 64 --eval-iws-interval 2000

plus scripts/aux_parity_eval_ours.py for the reference-law eval (cov from
sample_size**2 draws) on the trained checkpoint.

Env knobs: PARITY_SEED (default 1), PARITY_STEPS (4000), PARITY_BETA_ANN
(2000).
"""
import math, sys, time, types

# stub torchvision (only utils.visualization wants it; we never plot)
tv = types.ModuleType("torchvision"); tvu = types.ModuleType("torchvision.utils")
tvu.make_grid = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
tv.utils = tvu
sys.modules["torchvision"] = tv; sys.modules["torchvision.utils"] = tvu

sys.path.insert(0, "/root/reference")
import os

import numpy as np
import torch

_SEED = int(os.environ.get("PARITY_SEED", 1))
torch.manual_seed(_SEED)
np.random.seed(_SEED)

from models.ivae.auxtoy import ImplicitPosteriorVAE  # auxmlp
from models.resdae.mlp import ConditionalARDAE as MLPResCARDAE  # mlp-res
from utils.optim import Adam
from utils.msc import annealing_func

# config: aux-canonical hyperparams (auxresconvct line of run_vae_dbmnist.sh:
# adam beta1 0.9 / m-lr 1e-3, rmsprop momentum 0.9 / d-lr 1e-4, std-scale 100,
# delta 0.1, beta annealed from 1e-4) at toy sizes
BS, NZ_CDAE, NZ_MODEL = 256, 64, 1  # NZ_CDAE must be a perfect square (toy
H_MODEL, H_CDAE, NOISE_DIM = 64, 64, 10  # aux forward_hidden takes sqrt)
Z_DIM = 2
DELTA, STD_SCALE = 0.1, 100.0
M_LR, D_LR = 1e-3, 1e-4
STEPS = int(os.environ.get("PARITY_STEPS", 4000))
BETA_ANN = int(os.environ.get("PARITY_BETA_ANN", 2000))
BETA_INIT, BETA_FIN = 0.0001, 1.0

# data: 25-gaussians, same distribution + rng as the flat harness
def gen25(n, rng):
    lin = np.linspace(-4.0, 4.0, 5)
    xv, yv = np.meshgrid(lin, lin)
    mu = np.stack([xv.ravel(), yv.ravel()], 1)
    lab = rng.integers(0, 25, n)
    return (mu[lab] + math.sqrt(0.1) * rng.normal(size=(n, 2))).astype(np.float32)

rng = np.random.default_rng(7)
train = torch.from_numpy(gen25(200_000, rng))
test = torch.from_numpy(gen25(500, rng))

model = ImplicitPosteriorVAE(input_dim=2, noise_dim=NOISE_DIM, h_dim=H_MODEL,
                             z_dim=Z_DIM, nonlinearity='softplus',
                             num_hidden_layers=2, enc_type='simple',
                             clip_z0_logvar='none', clip_z_logvar='none')
cdae = MLPResCARDAE(input_dim=Z_DIM, h_dim=H_CDAE, context_dim=2 * H_MODEL,
                    std=1., num_hidden_layers=3, nonlinearity='softplus')
m_opt = Adam(model.parameters(), lr=M_LR, betas=(0.9, 0.999))
d_opt = torch.optim.RMSprop(cdae.parameters(), lr=D_LR, momentum=0.9)

perm = torch.randperm(train.size(0))
pos = 0
def next_batch():
    global pos, perm
    if pos + BS > train.size(0):
        perm = torch.randperm(train.size(0)); pos = 0
    b = train[perm[pos:pos+BS]]; globals()['pos'] = pos + BS
    return b

def hidden1a_context(x):
    """driver :737-741: encoder hidden feats at std=0, detached."""
    return model.encode.forward_hidden(x, std=0).detach().unsqueeze(1)

t0 = time.time()
for it in range(STEPS):
    beta = annealing_func(BETA_INIT, BETA_FIN, BETA_ANN, it)

    # PHASE A (ivae_ardae.py:707-779)
    d_opt.zero_grad()
    x = next_batch()
    context = hidden1a_context(x)                       # bsz x 1 x 2h
    latent_mean = model.encode(x, std=0).detach()       # bsz x 1 x zdim
    latent = model.forward_hidden(x, nz=NZ_CDAE).detach()  # bsz x nz x zdim
    lsm = STD_SCALE * (latent - latent_mean)
    std_qz = torch.std(lsm, dim=1, keepdim=True)
    std = DELTA * torch.mean(std_qz, dim=2, keepdim=True)
    stdmat = std * torch.randn(BS, NZ_CDAE, 1)
    _, cdae_loss = cdae(lsm, context, std=stdmat, scale=STD_SCALE)
    cdae_loss.backward()
    d_opt.step()

    # PHASE B (:781-846) — entropy grad scaled by beta (:834)
    m_opt.zero_grad()
    x = next_batch()
    out, _, latent, model_loss, recon_loss, prior_loss = model(
        x, beta=beta, nz=NZ_MODEL)
    model_loss.backward(retain_graph=True)
    context = hidden1a_context(x)
    latent_mean = model.encode(x, std=0).detach()
    lsm_det = STD_SCALE * (latent - latent_mean).detach()
    stdmat = torch.zeros(BS, NZ_MODEL, 1)
    grad = cdae.glogprob(lsm_det, context, std=stdmat, scale=STD_SCALE).detach()
    (STD_SCALE * (latent - latent_mean)).backward(
        beta * grad / float(BS * NZ_MODEL))
    m_opt.step()

    if (it + 1) % 100 == 0:
        print(f"iter {it+1} beta {beta:.4f} model_loss {model_loss.item():.4f} "
              f"recon {recon_loss.item():.4f} prior {prior_loss.item():.4f} "
              f"cdae {cdae_loss.item():.4f} sigma {std.mean().item():.5f} "
              f"({(time.time()-t0)*1000/(it+1):.1f} ms/step)", flush=True)

# reference evaluator: cov-Gaussian pseudo-posterior, cov from ss^2 draws
model.eval()
tot = 0.0
with torch.no_grad():
    for lo in range(0, test.size(0), 100):
        xb = test[lo:lo+100]
        lp = model.logprob(xb, sample_size=64)
        tot += lp.item() * xb.size(0)
print(f"REFERENCE aux test IWS-64 (seed {_SEED}):", tot / test.size(0))
