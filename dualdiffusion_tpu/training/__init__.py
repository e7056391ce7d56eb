from .sigma_sampler import SigmaSampler, SigmaSamplerConfig
from .ema import (EMABank, EMAConfig, power_function_beta, std_to_exp,
                  exp_to_std, solve_posthoc_coefficients, reconstruct_phema,
                  save_ema_archive)
from .optim import (build_optimizer, dynamic_grad_clip, lr_schedule, muon,
                    normalize_mp_weights)
from .train_state import (TrainState, UNetTrainConfig, make_unet_train_step,
                          make_unet_eval_step, init_train_state)
from . import losses
from .module_trainers import (DDECTrainConfig, DAETrainConfig,
                              JointDAEDDECConfig,
                              make_ddec_train_step, make_dae_train_step,
                              make_joint_dae_ddec_train_step,
                              random_stereo_augmentation)
