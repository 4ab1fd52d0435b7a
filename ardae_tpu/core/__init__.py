from ardae_tpu.core.losses import (
    loss_recon_bernoulli,
    loss_recon_bernoulli_with_logit,
    loss_recon_gaussian,
    loss_recon_gaussian_w_fixed_var,
    loss_kld_gaussian,
    loss_kld_gaussian_vs_gaussian,
    loss_entropy_gaussian,
    iwae_bound,
)
from ardae_tpu.core.stats import (
    logprob_gaussian,
    logprob_gaussian_w_fixed_var,
    loss_approx_marginal_entropy_gaussian,
    loss_marginal_entropy_gaussian,
    prob_gaussian,
    covmat,
    shuffle,
)
from ardae_tpu.core.energy import (
    energy_func1,
    energy_func2,
    energy_func3,
    energy_func4,
    normal_energy_func,
    normal_prob,
    regularization_func,
)
from ardae_tpu.core.annealing import annealing_func
from ardae_tpu.core.rng import sample_gaussian, sample_laplace, split_like_tree
