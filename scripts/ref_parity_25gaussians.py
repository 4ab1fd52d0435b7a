"""Head-to-head quality parity: REFERENCE implementation vs ardae_tpu.

Trains the reference's exact two-phase loop (torch CPU, modules imported
from /root/reference — ivae_ardae.py:707-846 semantics, vendored Adam +
torch RMSprop) on 25-gaussians at reduced sizes, then evaluates the
reference's own IWS-64 bound (cov-Gaussian pseudo-posterior).

The ardae_tpu side is the CLI at IDENTICAL flags:

  python -m ardae_tpu.cli.ivae_ardae --no-cuda --dataset 25gaussians \
    --nheight 1 --nchannels 2 --model mlp-concat --model-z-dim 2 \
    --model-h-dim 64 --model-n-layers 2 --model-nonlin relu --model-n-dim 10 \
    --cdae mlp-grad --cdae-h-dim 64 --cdae-n-layers 3 --cdae-nonlin softplus \
    --cdae-ctx-type lt0 --train-batch-size 256 --train-nz-cdae 64 \
    --delta 0.1 --std-scale 10000 --m-optimizer adam --m-beta1 0.5 \
    --d-optimizer rmsprop --d-momentum 0.5 --m-lr 0.0001 --d-lr 0.0001 \
    --epochs 9 --max-iters 6000 --toy-train-size 200000 --iws-samples 64 \
    --eval-iws-interval 3000

Measured results (6000 steps, VALIDATION.md "reference parity"):
reference -4.49 (1 seed); ardae_tpu -4.59 / -4.67 / -4.68 / -4.91
(4 seeds, mean -4.71) — the reference seed lands at the edge of our seed
distribution (best seed within 0.10 nats). Also: the reference executes at ~1.5-1.8 s/step on this
host CPU vs ~0.3 s/step for ardae_tpu's jitted chunk on the SAME CPU
(like-for-like 5x), and ~24 ms/step-class throughput on one TPU chip for
the full-size configs.

Run from /root/reference as cwd (or with it first on sys.path):
  python /root/repo/scripts/ref_parity_25gaussians.py
"""
import math, sys, time, types

# stub torchvision (only utils.visualization wants it; we never plot)
tv = types.ModuleType("torchvision"); tvu = types.ModuleType("torchvision.utils")
tvu.make_grid = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
tv.utils = tvu
sys.modules["torchvision"] = tv; sys.modules["torchvision.utils"] = tvu

sys.path.insert(0, "/root/reference")
import numpy as np
import torch

# PARITY_SEED varies model init + training noise; the dataset rng stays
# fixed (rng=7 below) so every seed trains/evals on identical data.
_SEED = int(__import__("os").environ.get("PARITY_SEED", 1))
torch.manual_seed(_SEED)
np.random.seed(_SEED)

from models.ivae.toy import ImplicitPosteriorVAE
from models.graddae.mlp import ConditionalARDAE
from utils.optim import Adam

# config (reduced canonical 25-gaussians: same hyperparams, smaller sizes)
BS, NZ_CDAE, NZ_MODEL = 256, 64, 1
H_MODEL, H_CDAE, NOISE_DIM = 64, 64, 10
DELTA, STD_SCALE = 0.1, 10000.0
M_LR = D_LR = 1e-4
import os
STEPS = int(os.environ.get("PARITY_STEPS", 6000))

# data: 25-gaussians, same distribution as datasets/toy.py exp4
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
                             z_dim=2, nonlinearity='relu',
                             num_hidden_layers=2, enc_type='concat')
cdae = ConditionalARDAE(input_dim=2, h_dim=H_CDAE, context_dim=2,
                        num_hidden_layers=3, nonlinearity='softplus')
m_opt = Adam(model.parameters(), lr=M_LR, betas=(0.5, 0.999))
d_opt = torch.optim.RMSprop(cdae.parameters(), lr=D_LR, momentum=0.5)

perm = torch.randperm(train.size(0))
pos = 0
def next_batch():
    global pos, perm
    if pos + BS > train.size(0):
        perm = torch.randperm(train.size(0)); pos = 0
    b = train[perm[pos:pos+BS]]; globals()['pos'] = pos + BS
    return b

t0 = time.time()
for it in range(STEPS):
    # PHASE A (ivae_ardae.py:707-779)
    d_opt.zero_grad()
    x = next_batch()
    context = model.encode(x, std=0).detach()            # lt0
    latent_mean = context                                 # same pass
    latent = model.forward_hidden(x, nz=NZ_CDAE).detach()
    lsm = STD_SCALE * (latent - latent_mean)
    std_qz = torch.std(lsm, dim=1, keepdim=True)
    std = DELTA * torch.mean(std_qz, dim=2, keepdim=True)
    stdmat = std * torch.randn(BS, NZ_CDAE, 1)
    _, cdae_loss = cdae(lsm, context.view(BS, 1, -1), std=stdmat, scale=STD_SCALE)
    cdae_loss.backward()
    d_opt.step()

    # PHASE B (:781-846)
    m_opt.zero_grad()
    x = next_batch()
    out, _, latent, model_loss, recon_loss, prior_loss = model(x, beta=1.0, nz=NZ_MODEL)
    model_loss.backward(retain_graph=True)
    context = model.encode(x, std=0).detach()
    latent_mean = context
    lsm_det = STD_SCALE * (latent - latent_mean).detach()
    stdmat = torch.zeros(BS, NZ_MODEL, 1)
    grad = cdae.glogprob(lsm_det, context.view(BS, 1, -1), std=stdmat, scale=STD_SCALE).detach()
    (STD_SCALE * (latent - latent_mean)).backward(1.0 * grad / float(BS * NZ_MODEL))
    m_opt.step()

    if (it + 1) % 500 == 0:
        print(f"iter {it+1} model_loss {model_loss.item():.4f} recon {recon_loss.item():.4f} "
              f"prior {prior_loss.item():.4f} cdae {cdae_loss.item():.4f} "
              f"({(time.time()-t0)*1000/(it+1):.1f} ms/step)", flush=True)

# IWS-64 eval (reference model.logprob, cov-Gaussian pseudo-posterior)
model.eval()
tot = 0.0
with torch.no_grad():
    for lo in range(0, test.size(0), 100):
        xb = test[lo:lo+100]
        lp = model.logprob(xb, sample_size=64)
        tot += lp.item() * xb.size(0)
print("REFERENCE test IWS-64:", tot / test.size(0))
