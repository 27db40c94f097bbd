from msgs.model.gaussians import GaussianConfig, GaussianState
