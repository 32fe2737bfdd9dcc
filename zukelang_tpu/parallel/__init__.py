"""Multi-chip sharding: mesh helpers, distributed MSM / NTT / witness eval.

The reference is single-process (SURVEY.md section 2, "parallelism:
none").  These are the pod-scale components the TPU build adds: points and
bucket work partitioned per chip with gathered partial-sum reduction, the
classic four-step NTT with an all_to_all transpose between chips, and
gate-sharded witness/constraint evaluation."""

from .sharded import (make_mesh, sharded_msm_g1, sharded_ntt,
                      sharded_gate_eval, sharded_prove_step)

__all__ = ["make_mesh", "sharded_msm_g1", "sharded_ntt",
           "sharded_gate_eval", "sharded_prove_step"]
