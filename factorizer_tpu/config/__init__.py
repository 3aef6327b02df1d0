from .parser import ConfigParser, load_config_files, merge_config, parse_override
from .bundle import run
