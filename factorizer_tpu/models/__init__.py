from .unet import UNet, Same
from .factorizer import FactMixer, FactorizerBlock, FactorizerStage, Factorizer
from .deconver import DeconvMixer, DeconverBlock, DeconverStage, Stem, Deconver
from .segresnet import SegResNet, SegResBlock
from .dynunet import DynUNet, DynUNetBlock
from .swinunetr import SwinUNETR, SwinBlock, WindowAttention
from .unetr import UNETR
