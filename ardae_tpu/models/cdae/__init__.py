from ardae_tpu.models.cdae.cardae import (
    MLPResCARDAE,
    MLPGradCARDAE,
    MLPResARDAE,
    MLPGradARDAE,
    MLPResDAE,
    MLPGradDAE,
    MLPResCDAE,
    MLPGradCDAE,
    cdae_loss,
    cdae_score,
    dae_loss,
    dae_score,
)
from ardae_tpu.models.cdae.legacy import MLPDAE, MLPCDAE
