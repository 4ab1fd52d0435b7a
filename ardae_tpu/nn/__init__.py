from ardae_tpu.nn.activations import get_nonlinear_func
from ardae_tpu.nn.linear import (
    Linear,
    WeightNormalizedLinear,
    ResLinear,
    ContextResLinear,
    ContextLinear,
    ContextWeightNormalizedLinear,
    ContextSoftPlusLinear,
    ContextSoftPlusWeightNormalizedLinear,
    SimplifiedBilinear,
    WeightNormalizedSimplifiedBilinear,
    StackedWeightNormalizedSimplifiedBilinear,
)
from ardae_tpu.nn.mlp import (
    MLP,
    WNMLP,
    ResMLP,
    ContextConcatMLP,
    ContextResMLP,
    ContextScaleMLP,
    ContextWNScaleMLP,
    ContextSPScaleMLP,
    ContextSPWNScaleMLP,
    ContextBilinearMLP,
    ContextWNBilinearMLP,
    ContextSWNBilinearMLP,
)
from ardae_tpu.nn.heads import NormalHead, BernoulliHead, clip_logvar
