"""Functional batched TVC environment + Gymnasium-compatible wrappers."""

from tvc_ai_tpu.env.registration import (  # noqa: F401
    make_debug_env,
    make_evaluation_env,
    make_legacy_env,
    make_training_env,
    register_envs,
)
from tvc_ai_tpu.env.rocket_env import reset, step, step_autoreset  # noqa: F401
from tvc_ai_tpu.env.wrappers import (  # noqa: F401
    EnhancedRocketTVCEnv,
    RocketConfig,
    RocketTVCEnv,
)
from tvc_ai_tpu.env.types import (  # noqa: F401
    ACTION_DIM,
    NUM_PHASES,
    OBS_DIM,
    OBS_DIM_LEGACY,
    PHASE_NAMES,
    DomainParams,
    EnvParams,
    EnvState,
    RandomizationConfig,
    RewardConfig,
    StepOutput,
    SuccessConfig,
    TerminationConfig,
)
