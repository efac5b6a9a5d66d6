"""Rendering (mirrors reference examples/rendering.py): frames + GIF export."""

import fluidgym_tpu

env = fluidgym_tpu.make("RBC2D-easy-v0", load_initial_domain=False,
                        load_domain_statistics=False)
env.reset(seed=0)
for _ in range(10):
    env.step(env.sample_action())
    env.render()
env.save_gif("rbc_episode", output_path="/tmp")
print("wrote /tmp/rbc_episode_temperature.gif")
