from .schedule import (  # noqa: F401
    Schedule,
    named_beta_schedule,
    space_timesteps,
    spaced_schedule,
)
from .gaussian import (  # noqa: F401
    MeanType,
    VarType,
    LossKind,
    q_sample,
    q_posterior_mean_variance,
    p_mean_variance,
    training_losses,
    masked_l2,
    smooth_l1,
    normal_kl,
    discretized_gaussian_log_likelihood,
)
from .sampling import (  # noqa: F401
    SamplerConfig,
    p_sample_loop,
    ddim_sample_loop,
    ddim_reverse_sample,
    ddim_reverse_sample_loop,
    plms_sample_loop,
    dpmpp2m_sample_loop,
    cfg_combine,
    make_cfg_model_fn,
)
from . import resample  # noqa: F401
