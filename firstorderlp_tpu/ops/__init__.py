from .linops import DenseOp, SparseOp, EllHalf, EllBucket, matvec, rmatvec
from .device_problem import DeviceQp, DeviceScaledQp, to_device, to_device_scaled

__all__ = [
    "DenseOp",
    "SparseOp",
    "EllHalf",
    "EllBucket",
    "matvec",
    "rmatvec",
    "DeviceQp",
    "DeviceScaledQp",
    "to_device",
    "to_device_scaled",
]
