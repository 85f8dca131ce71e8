import sys; sys.path.insert(0, "/tmp")
from fp_body import fingerprint
def test_fp(): fingerprint()
