"""Model zoo exports + the CLI-name registry (reference models/__init__.py:1-35)."""

from ardae_tpu.models.registry import (
    IVAE_MODELS,
    build_cdae,
    build_ivae_model,
    build_vae_model,
    context_dim_for,
)
from ardae_tpu.models.cdae import (
    MLPGradCARDAE,
    MLPResCARDAE,
    MLPGradARDAE,
    MLPResARDAE,
    MLPGradDAE,
    MLPResDAE,
    MLPDAE,
    MLPCDAE,
)
from ardae_tpu.models.ivae.toy import ToyIPVAE
from ardae_tpu.models.ivae.mnist import MNISTIPVAE
from ardae_tpu.models.ivae.conv import ConvIPVAE
from ardae_tpu.models.ivae.resconv import ResConvIPVAE
from ardae_tpu.models.ivae.aux import (
    MNISTAuxIPVAE,
    MNISTConvAuxIPVAE,
    MNISTResConvAuxIPVAE,
    MNISTResConvAuxIPVAEClipped,
    ToyAuxIPVAE,
)
from ardae_tpu.models.vae.toy import ToyVAE
from ardae_tpu.models.vae.mnist import MNISTVAE
from ardae_tpu.models.vae.conv import MNISTConvVAE
from ardae_tpu.models.vae.resconv import MNISTResConvVAE
from ardae_tpu.models.vae.aux import (
    MNISTAuxVAE,
    MNISTConvAuxVAE,
    MNISTResConvAuxVAE,
    ToyAuxVAE,
)
