from cvo_rgbd_tpu.ops.pallas_gram import color_gram, fused_flow, fused_step_coeffs

__all__ = ["color_gram", "fused_flow", "fused_step_coeffs"]
