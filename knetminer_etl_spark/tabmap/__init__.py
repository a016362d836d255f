from .compiler import AUTO_EDGE_ID, DataFrameMapper, chain_mappers  # noqa: F401
from .mappers import *  # noqa: F401,F403
from .tabfile import GenericTabFileMapper, TabFileMapper, read_tab_file  # noqa: F401
