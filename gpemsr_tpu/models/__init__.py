from gpemsr_tpu.models.prior import (
    Codebook, Decoder, Discriminator, Encoder, Indexer, LRGenerator,
    NonLocalBlock, ResidualBlock, VQGANGenerator,
)
from gpemsr_tpu.models.gpemsr import GPEMSR, POD, ThreeDA, DCNPack
from gpemsr_tpu.models.spynet import SpyNet
from gpemsr_tpu.models.vgg import VGG19Features
