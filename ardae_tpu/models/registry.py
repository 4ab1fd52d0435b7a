"""Model factories keyed by the reference CLI names.

build_ivae_model: ivae_ardae.py --model choices (reference :295-536).
build_vae_model:  vae.py --model choices (reference :197-303). 'toy-maf' is
registered-but-broken in the reference (models/__init__.py lacks ToyMAFVAE);
here it builds a WORKING conditional-MAF-posterior model (models/vae/maf.py,
documented extension).
build_cdae:       ivae_ardae.py --cdae choices (reference :567-609).
context_dim_for:  --cdae-ctx-type dimension rules (reference :568-582).
"""

from ardae_tpu.models.cdae import MLPGradCARDAE, MLPResCARDAE
from ardae_tpu.models.ivae.aux import (
    MNISTAuxIPVAE,
    MNISTConvAuxIPVAE,
    MNISTResConvAuxIPVAE,
    ToyAuxIPVAE,
)
from ardae_tpu.models.ivae.conv import ConvIPVAE
from ardae_tpu.models.ivae.mnist import MNISTIPVAE
from ardae_tpu.models.ivae.resconv import ResConvIPVAE
from ardae_tpu.models.ivae.toy import ToyIPVAE
from ardae_tpu.models.vae.aux import (
    MNISTAuxVAE,
    MNISTConvAuxVAE,
    MNISTResConvAuxVAE,
    ToyAuxVAE,
)
from ardae_tpu.models.vae.conv import MNISTConvVAE
from ardae_tpu.models.vae.maf import ToyMAFVAE
from ardae_tpu.models.vae.mnist import MNISTVAE
from ardae_tpu.models.vae.resconv import MNISTResConvVAE
from ardae_tpu.models.vae.toy import ToyVAE

IVAE_MODELS = (
    "mlp-concat", "mnist-concat", "mnist-conv",
    "resconv", "resconvct", "resconv-res", "resconvct-res",
    "resconv-res2", "resconvct-res2", "resconvct-res3", "resconv-res3",
    "resconv-res4", "resconvct-res4",
    "auxmlp", "auxmnist", "auxconv",
    "auxresconv", "auxresconvct", "auxresconv-clip", "auxresconvct-clip",
)

_RESCONV_ENC = {
    "resconv": ("mlp", False), "resconvct": ("mlp", True),
    "resconv-res": ("res-wn-mlp", False), "resconvct-res": ("res-wn-mlp", True),
    "resconv-res2": ("res-mlp", False), "resconvct-res2": ("res-mlp", True),
    "resconv-res3": ("res-wn-mlp-lin", False), "resconvct-res3": ("res-wn-mlp-lin", True),
    "resconv-res4": ("res-mlp-lin", False), "resconvct-res4": ("res-mlp-lin", True),
}


def build_ivae_model(name, *, nchannels=2, nheight=1, z_dim=2, h_dim=128,
                     n_dim=2, n_layers=2, nonlin="relu",
                     clip_z0_logvar="none", clip_z_logvar="none"):
    input_dim = nchannels * nheight * nheight
    clip0 = None if clip_z0_logvar == "none" else clip_z0_logvar
    clip1 = None if clip_z_logvar == "none" else clip_z_logvar
    if name == "mlp-concat":
        return ToyIPVAE(input_dim=input_dim, noise_dim=n_dim, h_dim=h_dim,
                        z_dim=z_dim, nonlinearity=nonlin,
                        num_hidden_layers=n_layers, enc_type="concat")
    if name == "mnist-concat":
        return MNISTIPVAE(input_dim=input_dim, noise_dim=n_dim, h_dim=h_dim,
                          z_dim=z_dim, nonlinearity=nonlin,
                          num_hidden_layers=n_layers, enc_type="concat")
    if name == "mnist-conv":
        return ConvIPVAE(input_height=nheight, input_channels=nchannels,
                         z_dim=z_dim, noise_dim=n_dim, nonlinearity=nonlin)
    if name in _RESCONV_ENC:
        enc_type, do_center = _RESCONV_ENC[name]
        return ResConvIPVAE(input_height=nheight, input_channels=nchannels,
                            z_dim=z_dim, h_dim=h_dim,
                            num_hidden_layers=n_layers, noise_dim=n_dim,
                            nonlinearity=nonlin, do_center=do_center,
                            enc_type=enc_type)
    if name == "auxmlp":
        return ToyAuxIPVAE(input_dim=input_dim, noise_dim=n_dim, h_dim=h_dim,
                           z_dim=z_dim, nonlinearity=nonlin,
                           num_hidden_layers=n_layers,
                           clip_z0_logvar=clip0, clip_z_logvar=clip1)
    if name == "auxmnist":
        return MNISTAuxIPVAE(input_dim=input_dim, noise_dim=n_dim, h_dim=h_dim,
                             z_dim=z_dim, nonlinearity=nonlin,
                             num_hidden_layers=n_layers,
                             clip_z0_logvar=clip0, clip_z_logvar=clip1)
    if name == "auxconv":
        return MNISTConvAuxIPVAE(input_height=nheight, input_channels=nchannels,
                                 z0_dim=n_dim, z_dim=z_dim, nonlinearity=nonlin)
    if name in ("auxresconv", "auxresconvct"):
        return MNISTResConvAuxIPVAE(input_height=nheight,
                                    input_channels=nchannels, z_dim=z_dim,
                                    c_dim=450, z0_dim=n_dim,
                                    nonlinearity=nonlin,
                                    do_center=name.endswith("ct"))
    if name in ("auxresconv-clip", "auxresconvct-clip"):
        return MNISTResConvAuxIPVAE(input_height=nheight,
                                    input_channels=nchannels, z_dim=z_dim,
                                    c_dim=450, z0_dim=n_dim,
                                    nonlinearity=nonlin,
                                    do_center="ct-" in name or name.startswith("auxresconvct"),
                                    clipped=True)
    raise NotImplementedError(f"unknown ivae model: {name}")


def build_vae_model(name, *, nchannels=1, nheight=28, z_dim=8, h_dim=300,
                    n_dim=0, n_layers=1, nonlin="softplus", clip_logvar="none"):
    input_dim = nchannels * nheight * nheight
    if name == "toy":
        return ToyVAE(input_dim=input_dim, h_dim=h_dim, z_dim=z_dim,
                      nonlinearity=nonlin, num_hidden_layers=n_layers)
    if name == "toy-maf":
        # Unregistered/broken in the reference (vae.py:205-212 selects
        # ToyMAFVAE, models/__init__.py never exports it — the CLI crashes
        # there). We ship a WORKING conditional-MAF-posterior realization of
        # the evident intent (models/vae/maf.py) — a documented TPU-side
        # extension, not a parity port.
        return ToyMAFVAE(input_dim=input_dim, h_dim=h_dim, z_dim=z_dim,
                         nonlinearity=nonlin, num_hidden_layers=n_layers)
    if name == "mnist":
        return MNISTVAE(input_dim=input_dim, h_dim=h_dim, z_dim=z_dim,
                        nonlinearity=nonlin, num_hidden_layers=n_layers,
                        do_xavier=False, do_m5bias=False)
    if name == "conv":
        return MNISTConvVAE(input_height=nheight, input_channels=nchannels,
                            z_dim=z_dim, nonlinearity=nonlin,
                            do_xavier=False, do_m5bias=False)
    if name in ("resconv", "resconvct"):
        # NOTE: the reference driver passes do_center=False for BOTH
        # (vae.py:233-249); we honor the evident intent for 'resconvct'.
        return MNISTResConvVAE(input_height=nheight, input_channels=nchannels,
                               z_dim=z_dim, nonlinearity=nonlin,
                               do_center=name.endswith("ct"), do_m5bias=False)
    if name == "auxtoy":
        return ToyAuxVAE(input_dim=input_dim, noise_dim=n_dim, h_dim=h_dim,
                         z_dim=z_dim, nonlinearity=nonlin,
                         num_hidden_layers=n_layers, clip_logvar=clip_logvar)
    if name == "auxmnist":
        return MNISTAuxVAE(input_dim=input_dim, noise_dim=n_dim, h_dim=h_dim,
                           z_dim=z_dim, nonlinearity=nonlin,
                           num_hidden_layers=n_layers, clip_logvar=clip_logvar,
                           do_xavier=False)
    if name == "auxconv":
        return MNISTConvAuxVAE(input_height=nheight, input_channels=nchannels,
                               z0_dim=n_dim, z_dim=z_dim, nonlinearity=nonlin,
                               do_xavier=False)
    if name in ("auxresconv", "auxresconvct"):
        return MNISTResConvAuxVAE(input_height=nheight, input_channels=nchannels,
                                  z0_dim=n_dim, z_dim=z_dim,
                                  nonlinearity=nonlin,
                                  do_center=name.endswith("ct"))
    raise NotImplementedError(f"unknown vae model: {name}")


def context_dim_for(ctx_type, *, model_name, nchannels, nheight, z_dim, h_dim):
    """--cdae-ctx-type dimension (reference ivae_ardae.py:568-582)."""
    if ctx_type == "data":
        return nchannels * nheight * nheight
    if ctx_type == "lt0":
        return z_dim
    if ctx_type == "hidden1a":
        if model_name in ("auxmlp", "auxmnist"):
            return h_dim * 2
        if model_name == "auxconv":
            return 800 * 2
        if model_name in ("auxresconv", "auxresconvct",
                          "auxresconv-clip", "auxresconvct-clip"):
            return 450
        return h_dim
    raise NotImplementedError(ctx_type)


def build_cdae(name, *, input_dim, context_dim, h_dim=128, n_layers=2,
               nonlin="relu"):
    if name == "mlp-res":
        return MLPResCARDAE(input_dim=input_dim, context_dim=context_dim,
                            h_dim=h_dim, num_hidden_layers=n_layers,
                            nonlinearity=nonlin)
    if name == "mlp-grad":
        return MLPGradCARDAE(input_dim=input_dim, context_dim=context_dim,
                             h_dim=h_dim, num_hidden_layers=n_layers,
                             nonlinearity=nonlin)
    raise NotImplementedError(f"unknown cdae: {name}")
