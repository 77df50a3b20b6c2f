from .pwcnet import PWCNet, PWCDCNet, pwcnet, pwcnet_nodc  # noqa: F401
