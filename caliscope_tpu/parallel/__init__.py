"""Multi-device (SPMD) execution: observation-axis sharding over a Mesh.

The reference is a single-process desktop app (SURVEY.md §2.10) — its only
parallelism is one decode thread per camera. The TPU-native scaling design
shards the OBSERVATION axis (frames x cameras x keypoints, the analog of
"sequence length") across a `jax.sharding.Mesh`: per-observation Jacobian
blocks and residuals are computed shard-locally, and the segment-sum
normal-equation reductions (camera 9x9 blocks, point 3x3 blocks, gradients)
lower to XLA all-reduces over ICI automatically. Camera/point parameters stay
replicated — they are tiny (9C + 3P floats) next to the observation data.
"""

from caliscope_tpu.parallel.sharded import (  # noqa: F401
    make_obs_mesh,
    shard_problem,
    sharded_lm_iteration,
)
