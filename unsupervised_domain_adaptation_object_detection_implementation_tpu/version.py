"""Version info.

TPU-native rebuild of the reference UDAOD framework
(reference: /root/reference, an MMDetection 2.19.0 fork — mmdet/version.py:3).
"""

__version__ = '0.1.0'


def version_info():
    return tuple(int(p) for p in __version__.split('.'))
