"""IMAGE-SCALE aux head-to-head: REFERENCE auxmnist on the v3 surrogate.

Round-2 VERDICT item 2: the dbMNIST aux pathology (aux pairs tie/lose;
auxresconvct collapses) was attributed to the workload by extrapolation from
the toy head-to-head only. This harness runs the REFERENCE's own hierarchical
implicit model at image scale — net.MNISTAuxIPVAE
(/root/reference/models/ivae/auxmnist.py:47-428) + mlp-grad cdae with
hidden1a context (ivae_ardae.py:572-575, :736-741) — through the reference
two-phase loop (ivae_ardae.py:707-846) on the SAME v3 surrogate
dbMNIST-val5k our CLI trains on, at reduced scale (CPU-feasible).

Canonical auxmnist hyperparams (run_vae_dbmnist.sh line 50): z=32, h=300,
L=2 softplus, n_dim=100, mlp-grad h=256 L=5, hidden1a, beta FIXED at 1.0
(no annealing on this config), delta=0.1, std-scale=10000, adam(0.5)/m-lr
1e-4, rmsprop(0.5)/d-lr 1e-4. Reduced: bs=32, nz_cdae=64, 2500 steps
(~2 s/step reference torch on this host's single core).

Eval: the reference's own logprob_w_cov_gaussian_posterior
(auxmnist.py:297-358 — cov from sample_size draws, 1e-5 jitter, Bernoulli
loglik, +1e-10 floor) on the FIRST 500 val items binarized ONCE with
numpy rng(1234) — a deliberate deviation from the reference's
re-binarize-per-eval transform so both sides of the head-to-head score the
exact same binary matrix (scripts/aux_parity_eval_ours_mnist.py consumes the
same items).

Env knobs: PARITY_SEED (default 1), PARITY_STEPS (3000), PARITY_EVAL_EVERY
(1000), PARITY_DELTA (0.1), PARITY_STD_SCALE (10000 — set 100 for the
knob-search winning regime). Run from /root/repo.
"""
import os
import sys
import time
import types

# stub torchvision (only utils.visualization wants it; we never plot)
tv = types.ModuleType("torchvision"); tvu = types.ModuleType("torchvision.utils")
tvu.make_grid = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
tv.utils = tvu
sys.modules["torchvision"] = tv; sys.modules["torchvision.utils"] = tvu

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")

import numpy as np
import torch

_SEED = int(os.environ.get("PARITY_SEED", 1))
torch.manual_seed(_SEED)
np.random.seed(_SEED)

from models import MNISTAuxIPVAE, MLPGradCARDAE  # noqa: E402 (reference)
from utils.optim import Adam  # noqa: E402 (reference vendored Adam)

from ardae_tpu.data.mnist import get_mnist  # noqa: E402 (same v3 surrogate)

BS = int(os.environ.get("PARITY_BS", 32))
NZ_CDAE = int(os.environ.get("PARITY_NZ", 64))
NZ_MODEL = 1
Z_DIM, H_MODEL, NHL, NOISE_DIM = 32, 300, 2, 100
H_CDAE, CDAE_NHL = 256, 5
DELTA = float(os.environ.get("PARITY_DELTA", 0.1))
STD_SCALE = float(os.environ.get("PARITY_STD_SCALE", 10000.0))
M_LR = D_LR = 1e-4
BETA = 1.0  # canonical auxmnist: beta-init 1.0, beta-fin 1.0, no annealing
STEPS = int(os.environ.get("PARITY_STEPS", 3000))
EVAL_EVERY = int(os.environ.get("PARITY_EVAL_EVERY", 1000))
N_EVAL_ITEMS, SS = 500, 64

data = get_mnist("dbmnist-val5k", root="/root/repo/data")
train = torch.from_numpy(np.asarray(data["train"], np.float32))
val_probs = np.asarray(data["val"][:N_EVAL_ITEMS], np.float32)
# fixed shared binarization (see module docstring)
val_bin = torch.from_numpy(
    (np.random.default_rng(1234).random(val_probs.shape) < val_probs)
    .astype(np.float32))

model = MNISTAuxIPVAE(input_dim=784, noise_dim=NOISE_DIM, h_dim=H_MODEL,
                      num_hidden_layers=NHL, nonlinearity='softplus',
                      enc_type='simple', z_dim=Z_DIM,
                      clip_z0_logvar='none', clip_z_logvar='none')
cdae = MLPGradCARDAE(input_dim=Z_DIM, context_dim=2 * H_MODEL, std=1.,
                     h_dim=H_CDAE, num_hidden_layers=CDAE_NHL,
                     nonlinearity='softplus', noise_type='gaussian',
                     enc_ctx=True, enc_input=True)
m_opt = Adam(model.parameters(), lr=M_LR, betas=(0.5, 0.999))
d_opt = torch.optim.RMSprop(cdae.parameters(), lr=D_LR, momentum=0.5)

perm = torch.randperm(train.size(0))
pos = 0
def next_batch():
    global pos, perm
    if pos + BS > train.size(0):
        perm = torch.randperm(train.size(0)); pos = 0
    b = train[perm[pos:pos + BS]]; globals()['pos'] = pos + BS
    return torch.bernoulli(b)  # dynamic binarization (datasets/mnist.py:40)


def eval_iws(tag):
    model.eval()
    tot = 0.0
    with torch.no_grad():
        for lo in range(0, val_bin.size(0), 50):
            xb = val_bin[lo:lo + 50]
            tot += model.logprob(xb, sample_size=SS).item() * xb.size(0)
    model.train()
    print(f"EVAL {tag} REFERENCE auxmnist val IWS-{SS} (seed {_SEED}): "
          f"{tot / val_bin.size(0):.4f}", flush=True)


def hidden1a_context(x):
    """driver :736-741: encoder hidden feats cat(h0,h) at std=0, detached."""
    return model.encode.forward_hidden(x, std=0).detach().unsqueeze(1)


t0 = time.time()
for it in range(STEPS):
    # PHASE A (ivae_ardae.py:707-779)
    d_opt.zero_grad()
    x = next_batch()
    context = hidden1a_context(x)                          # bsz x 1 x 2h
    latent_mean = model.encode(x, std=0).detach()          # bsz x 1 x zdim
    latent = model.forward_hidden(x, nz=NZ_CDAE).detach()  # bsz x nz x zdim
    lsm = STD_SCALE * (latent - latent_mean)
    std_qz = torch.std(lsm, dim=1, keepdim=True)
    std = DELTA * torch.mean(std_qz, dim=2, keepdim=True)
    stdmat = std * torch.randn(BS, NZ_CDAE, 1)
    _, cdae_loss = cdae(lsm, context, std=stdmat, scale=STD_SCALE)
    cdae_loss.backward()
    d_opt.step()

    # PHASE B (:781-846)
    m_opt.zero_grad()
    x = next_batch()
    out, _, latent, model_loss, recon_loss, prior_loss = model(
        x, beta=BETA, nz=NZ_MODEL)
    model_loss.backward(retain_graph=True)
    context = hidden1a_context(x)
    latent_mean = model.encode(x, std=0).detach()
    lsm_det = STD_SCALE * (latent - latent_mean).detach()
    stdmat = torch.zeros(BS, NZ_MODEL, 1)
    grad = cdae.glogprob(lsm_det, context, std=stdmat, scale=STD_SCALE).detach()
    (STD_SCALE * (latent - latent_mean)).backward(
        BETA * grad / float(BS * NZ_MODEL))
    m_opt.step()

    if (it + 1) % 100 == 0:
        print(f"iter {it+1} model_loss {model_loss.item():.4f} "
              f"recon {recon_loss.item():.4f} prior {prior_loss.item():.4f} "
              f"cdae {cdae_loss.item():.4f} sigma_eff {std.mean().item():.4f} "
              f"sigma_max {std.max().item():.4f} sigma_min {std.min().item():.4f} "
              f"({(time.time()-t0)*1000/(it+1):.1f} ms/step)", flush=True)
    if (it + 1) % EVAL_EVERY == 0 and (it + 1) < STEPS:
        eval_iws(f"iter{it+1}")

eval_iws("final")
