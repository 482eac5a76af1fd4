from cvo_rgbd_tpu.evaluation.associate import associate
from cvo_rgbd_tpu.evaluation.ate import ate_rmse, horn_align
from cvo_rgbd_tpu.evaluation.baselines import mint_fr1_desk_baselines
from cvo_rgbd_tpu.evaluation.rpe import rpe

__all__ = [
    "associate", "ate_rmse", "horn_align", "mint_fr1_desk_baselines", "rpe",
]
