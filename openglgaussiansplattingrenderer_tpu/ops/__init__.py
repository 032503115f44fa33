from openglgaussiansplattingrenderer_tpu.ops import transforms, projection, binning, sorting, compositing  # noqa: F401
