from .meganerf import MegaNeRFModel, MLPParams, mlp_forward

__all__ = ["MegaNeRFModel", "MLPParams", "mlp_forward"]
