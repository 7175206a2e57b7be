from . import basic
from . import attention
from . import optimizer
