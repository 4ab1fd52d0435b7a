"""Reference-implementation (torch CPU) step timings for BASELINE.md rows.

Round-1 VERDICT "missing #3": only the conv-IVAE joint step had a measured
torch baseline (0.00664 steps/s on this host). This harness times the two
other bench rows with the reference's own modules and loop structure:

  flagship : resconvct-res IVAE (ResConvIPVAE res-wn-mlp, h=512) + mlp-res
             cdae (h=512 x5, lt0 ctx), bs=128, nz_cdae=625, 2 cdae
             updates/step — the exact joint step of run_vae_dbmnist.sh:35
             (ivae_ardae.py:707-846 semantics).
  vae      : conv baseline VAE driver step (MNISTConvVAE, vae.py:380-417),
             bs=128.

Synthetic binarized-MNIST-shaped data (timing only — data content does not
affect step cost). Run on an OTHERWISE IDLE CPU (timings on a contended
core understate the reference). Usage:

  cd /root/reference && python /root/repo/scripts/ref_timing.py [flagship|vae|all]
"""
import os
import sys
import time
import types

tv = types.ModuleType("torchvision"); tvu = types.ModuleType("torchvision.utils")
tvu.make_grid = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
tv.utils = tvu
sys.modules["torchvision"] = tv; sys.modules["torchvision.utils"] = tvu

sys.path.insert(0, "/root/reference")
import numpy as np
import torch

torch.manual_seed(0)
np.random.seed(0)

BS, NZ_CDAE, NZ_MODEL = 128, 625, 1
STEPS_FLAG = int(os.environ.get("TIMING_STEPS", 3))
STD_SCALE, DELTA = 100.0, 0.1


def synth_batch():
    return torch.bernoulli(torch.rand(BS, 1, 28, 28))


def time_flagship():
    from models.ivae.resconv import ImplicitPosteriorVAE as ResConvIPVAE
    from models.resdae.mlp import ConditionalARDAE as MLPResCARDAE
    from utils.optim import Adam

    model = ResConvIPVAE(input_height=28, input_channels=1, z_dim=32,
                         h_dim=512, num_hidden_layers=1, noise_dim=100,
                         nonlinearity='elu', do_center=True,
                         enc_type='res-wn-mlp')
    cdae = MLPResCARDAE(input_dim=32, h_dim=512, context_dim=32, std=1.,
                        num_hidden_layers=5, nonlinearity='softplus')
    m_opt = Adam(model.parameters(), lr=1e-3, betas=(0.9, 0.999))
    d_opt = torch.optim.RMSprop(cdae.parameters(), lr=1e-4, momentum=0.9)

    def one_step():
        # PHASE A x2 (num_cdae_updates=2; ivae_ardae.py:713-779, ctx lt0)
        for _ in range(2):
            d_opt.zero_grad()
            x = synth_batch()
            context = model.encode(x, std=0).detach()
            latent_mean = context
            latent = model.forward_hidden(x, nz=NZ_CDAE).detach()
            lsm = STD_SCALE * (latent - latent_mean)
            std_qz = torch.std(lsm, dim=1, keepdim=True)
            std = DELTA * torch.mean(std_qz, dim=2, keepdim=True)
            stdmat = std * torch.randn(BS, NZ_CDAE, 1)
            _, cdae_loss = cdae(lsm, context.view(BS, 1, -1), std=stdmat,
                                scale=STD_SCALE)
            cdae_loss.backward()
            d_opt.step()
        # PHASE B (:781-846)
        m_opt.zero_grad()
        x = synth_batch()
        out = model(x, beta=1.0, nz=NZ_MODEL)
        _, _, latent, model_loss = out[0], out[1], out[2], out[3]
        model_loss.backward(retain_graph=True)
        context = model.encode(x, std=0).detach()
        latent_mean = context
        lsm_det = STD_SCALE * (latent - latent_mean).detach()
        stdmat = torch.zeros(BS, NZ_MODEL, 1)
        grad = cdae.glogprob(lsm_det, context.view(BS, 1, -1), std=stdmat,
                             scale=STD_SCALE).detach()
        (STD_SCALE * (latent - latent_mean)).backward(
            grad / float(BS * NZ_MODEL))
        m_opt.step()

    one_step()  # warmup
    t0 = time.time()
    for _ in range(STEPS_FLAG):
        one_step()
    dt = (time.time() - t0) / STEPS_FLAG
    print(f"REFERENCE flagship resconvct-res joint step: {dt:.2f} s/step "
          f"({1.0/dt:.5f} steps/s)", flush=True)


def time_vae():
    from models.vae.conv import VAE as MNISTConvVAE
    from utils.optim import Adam

    model = MNISTConvVAE(input_height=28, input_channels=1,
                         nonlinearity='softplus', z_dim=32, do_xavier=False,
                         do_m5bias=False)
    opt = Adam(model.parameters(), lr=1e-4, betas=(0.5, 0.999))
    steps = 50

    def one_step():
        opt.zero_grad()
        x = synth_batch()
        out = model(x, beta=1.0)
        loss = out[3] / 784.0  # vae.py:410 loss scaling
        loss.backward()
        opt.step()

    one_step()
    t0 = time.time()
    for _ in range(steps):
        one_step()
    dt = (time.time() - t0) / steps
    print(f"REFERENCE conv VAE driver step: {dt*1000:.1f} ms/step "
          f"({1.0/dt:.2f} steps/s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("vae", "all"):
        time_vae()
    if which in ("flagship", "all"):
        time_flagship()
