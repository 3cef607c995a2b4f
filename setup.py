"""Install script (mirrors the packaging role of the reference's setup.py)."""

from setuptools import find_packages, setup


def get_version():
    ns = {}
    with open('unsupervised_domain_adaptation_object_detection_implementation_tpu/version.py') as f:
        exec(f.read(), ns)
    return ns['__version__']


setup(
    name='unsupervised_domain_adaptation_object_detection_implementation_tpu',
    version=get_version(),
    description='TPU-native (JAX/XLA/Pallas) unsupervised domain adaptation '
                'object detection framework',
    packages=find_packages(exclude=('tests', 'tools', 'configs')),
    python_requires='>=3.10',
    install_requires=['jax', 'flax', 'optax', 'numpy', 'einops'],
    extras_require={'ckpt': ['orbax-checkpoint'], 'test': ['pytest']},
)
