"""Install the shared rich timm/torchvision fakes before any model test
fixture can register a minimal one (neither library is installed in this
environment; reference oracles import them)."""

from tests.models.test_flowformer import _install_timm_stub
from tests.models.test_memfof import _install_torchvision_stub

_install_timm_stub()
_install_torchvision_stub()
