"""Multi-chip scaling: sharded retrieval, mapping and pose-graph solves.

The reference scales by OS processes + threads on one machine (SURVEY.md §2
parallelism inventory); here the growth axes — keyframe database, map
points, factor graph — shard over a jax.sharding.Mesh with XLA collectives
riding ICI (psum/all_gather), per BASELINE.json's north star. Odometry
stays latency-bound per chip by design.
"""
