from .unet import UNet3D
from .fader import AE, Encoder, Decoder, Discriminator, Classificator
from .cnn import VoxResNet, CNN, ConvLSTM, DilatedCNN
from .patch_model import PatchModel
from .modified_unet import Modified3DUNet
from .brats_unet import BraTSUnet
from .residual_unet import ResidualUNet3D
from .bayes import (BayesConv3d, BayesConv2d, ConvSample, DeFlatten, flatten,
                    ConvLayer, ConvTransposeLayer, DownConv, InitConv,
                    UpConv, FinalConv)

__all__ = [
    "UNet3D", "AE", "Encoder", "Decoder", "Discriminator", "Classificator",
    "VoxResNet", "CNN", "ConvLSTM", "DilatedCNN", "PatchModel",
    "Modified3DUNet", "BraTSUnet", "ResidualUNet3D", "BayesConv3d",
    "BayesConv2d", "ConvSample", "DeFlatten", "flatten", "ConvLayer",
    "ConvTransposeLayer", "DownConv", "InitConv", "UpConv", "FinalConv",
]
