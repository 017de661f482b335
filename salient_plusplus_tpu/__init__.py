"""salient_plusplus_tpu — TPU-native distributed GNN training framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of SALIENT++
(MITIBMxGraph/SALIENT_plusplus, MLSys 2023): fast host-side C++ neighbor
sampling producing padded static-shape batches, a pipelined input feed, SPMD
data-parallel training over TPU meshes, disjoint feature partitioning with
on-device all-to-all exchange, and VIP (vertex inclusion probability)
analysis + caching. See ARCHITECTURE.md and SURVEY.md.
"""

__version__ = "0.1.0"
