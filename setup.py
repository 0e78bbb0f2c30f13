from setuptools import setup, find_packages
setup(name="volsurfs_tpu", version="0.1.0", packages=find_packages(include=["volsurfs_tpu*"]))
