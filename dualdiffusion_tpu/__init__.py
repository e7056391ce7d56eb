"""dualdiffusion_tpu — a TPU-native (JAX/XLA/Pallas/pjit) latent-diffusion
music-generation framework with the capabilities of parlance-zz/dualdiffusion.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

  utils/      config + io substrate (JSON->dataclass hydration, safetensors,
              audio io, env paths)
  ops/        pure-jnp / Pallas DSP core: windows, STFT, mel filterbank,
              MDCT/MCLT, FGLA phase reconstruction, resamplers
  models/     magnitude-preserving NN library (mp), EDM2 MP-UNet, DAE,
              diffusion decoder, embeddings, discriminator, formats
  parallel/   mesh construction, sharding rules, halo-exchange helpers
  training/   train state, sigma samplers, EMA bank, optax transforms,
              losses, module trainers, the pjit trainer
  sampling/   sigma schedules + the EDM sampler loop (lax.scan), model server
  dataset/    multiprocess dataset factory + training dataloader
  pipelines/  module registry + pipeline container (save/load, sampling API)
"""

__version__ = "0.1.0"
