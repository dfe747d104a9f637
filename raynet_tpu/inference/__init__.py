from .forward_pass import (
    ForwardPass,
    MultiViewCNNForwardPass,
    MultiViewCNNVoxelSpaceForwardPass,
    RayNetForwardPass,
    HartmannForwardPass,
    get_forward_pass_factory,
)
