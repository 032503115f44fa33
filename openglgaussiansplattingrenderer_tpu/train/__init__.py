from openglgaussiansplattingrenderer_tpu.train.trainer import (  # noqa: F401
    TrainConfig,
    TrainState,
    fit_scene,
    make_train_step,
)
from openglgaussiansplattingrenderer_tpu.train import losses  # noqa: F401
from openglgaussiansplattingrenderer_tpu.train.densify import (  # noqa: F401
    DensifyConfig,
    densify_and_prune,
    fit_scene_adaptive,
)
