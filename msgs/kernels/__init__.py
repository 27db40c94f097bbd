from msgs.kernels.rasterize import RasterSettings, RenderOutput, rasterize
