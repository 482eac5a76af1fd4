from cvo_rgbd_tpu.ops.pallas_gram import fused_flow, fused_step_coeffs

__all__ = ["fused_flow", "fused_step_coeffs"]
