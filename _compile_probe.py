import time, jax
from tvc_ai_tpu.agents.sac import SACConfig
from tvc_ai_tpu.env.types import EnvParams
from tvc_ai_tpu.training import loop as L

env_params = EnvParams()
for (T, U, H, B) in [(8,1,256,1024), (8,16,256,1024), (64,1,256,1024), (64,16,64,256)]:
    sac_cfg = SACConfig(batch_size=B, buffer_size=1<<20, learning_starts=100, hidden_dims=(H,H))
    loop_cfg = L.TrainLoopConfig(num_envs=512, rollout_steps=T, updates_per_step=U)
    carry = L.init_carry(jax.random.PRNGKey(0), env_params, sac_cfg, loop_cfg)
    it = jax.jit(L.make_train_iteration(sac_cfg, loop_cfg), donate_argnums=(0,))
    t0=time.perf_counter()
    carry, m = it(carry, env_params); jax.block_until_ready(m)
    print(f"T={T} U={U} H={H} B={B}: compile+run %.1fs" % (time.perf_counter()-t0), flush=True)
