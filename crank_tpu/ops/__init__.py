from crank_tpu.ops.vq_pallas import vq_fused  # noqa: F401
