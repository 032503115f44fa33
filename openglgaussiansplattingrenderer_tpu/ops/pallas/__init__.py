from openglgaussiansplattingrenderer_tpu.ops.pallas import composite  # noqa: F401
