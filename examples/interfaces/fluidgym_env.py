"""Plain FluidGym-TPU environment loop (mirrors reference
examples/interfaces/fluidgym_env.py)."""

import fluidgym_tpu

env = fluidgym_tpu.make("RBC2D-easy-v0", load_initial_domain=False,
                        load_domain_statistics=False)
obs, info = env.reset(seed=42)
for _ in range(10):
    action = env.sample_action()
    obs, reward, terminated, truncated, info = env.step(action)
    print(f"reward={float(reward[0]):.4f} nusselt={float(info['nusselt']):.4f}")
