"""zukelang_tpu — a TPU-native zkSNARK framework.

A from-scratch re-design of the capabilities of camlspotter/zukelang
(/root/reference): a typed ZK DSL, an R1CS-style circuit compiler with
witness generation, QAP construction, and Pinocchio-Protocol-2 + Groth16
SNARKs over BLS12-381 — with the hot algebra (multi-limb field arithmetic,
NTT, Pippenger MSM) implemented as JAX/Pallas array programs that shard
over TPU meshes.

Layering (bottom to top; see SURVEY.md section 1 for the reference map):
  params         — BLS12-381 constants & limb layouts
  golden/        — pure-python field/curve/pairing oracle (blst's role)
  ops/           — JAX limb arithmetic, NTT, curve kernels, MSM
  core/          — Var, Circuit IR, Lang DSL, compiler, QAP
  protocols/     — Groth16, Pinocchio (NonZK + ZK)
  parallel/      — mesh sharding for MSM / NTT / witness evaluation
  frontend/      — Python-syntax front end (analog of the OCaml one)
  testing/       — random_test harness + program suites
"""

__version__ = "0.1.0"
