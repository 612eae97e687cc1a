import time, jax, dataclasses
from tvc_ai_tpu.config import load_config, build_env_params, build_sac_config, build_loop_config
from tvc_ai_tpu.training import loop as L

cfg = load_config(None, overrides=[
 'training.total_timesteps=5000000','training.num_envs=512','training.rollout_steps=64',
 'training.updates_per_step=16','algorithms.sac.batch_size=1024',
 'algorithms.sac.learning_starts=10000','curriculum.enabled=false'])
env_params = build_env_params(cfg, None)
sac_cfg = build_sac_config(cfg)
loop_cfg = build_loop_config(cfg)
print("sac_cfg:", sac_cfg.buffer_size, sac_cfg.batch_size, sac_cfg.hidden_dims, sac_cfg.lr_actor, flush=True)
t0=time.perf_counter()
init_fn = jax.jit(lambda k: L.init_carry(k, env_params, sac_cfg, loop_cfg))
carry = init_fn(jax.random.PRNGKey(0))
jax.block_until_ready(carry.obs)
print("init compile+run: %.1fs" % (time.perf_counter()-t0), flush=True)
t0=time.perf_counter()
it = jax.jit(L.make_train_iteration(sac_cfg, loop_cfg), donate_argnums=(0,))
carry, m = it(carry, env_params); jax.block_until_ready(m)
print("iteration compile+run: %.1fs" % (time.perf_counter()-t0), flush=True)
