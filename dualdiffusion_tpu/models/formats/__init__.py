from .format import Format, FormatConfig, register_format, get_format_class
from .spectrogram import SpectrogramFormat, SpectrogramFormatConfig
from .ms_mdct_dual import MSMDCTDualFormat, MSMDCTDualFormatConfig
from .mdct import MDCTFormat, MDCTFormatConfig
from .raw import RawFormat, RawFormatConfig
