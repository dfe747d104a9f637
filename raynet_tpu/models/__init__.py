from .cnn import (
    SimpleCNN,
    SimpleCNNLN,
    DilatedCNN25,
    DilatedCNN25Tanh,
    HartmannCNN,
    cnn_factory,
    cnn_output_padding,
    MultiViewSimilarityNet,
    HartmannSimilarityNet,
    get_nn,
)
from .losses import emd, squared_emd, expected_squared_error, loss_factory, mae, mde
from .optimizers import optimizer_factory, kernel_regularizer_factory
