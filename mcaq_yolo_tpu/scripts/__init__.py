"""Offline analysis scripts (run as `python -m mcaq_yolo_tpu.scripts.<name>`):

backend_agreement — JAX metric surrogates vs exact cv2 backend correlation
m3_permutation    — bit-placement ablation (MCAQ vs random vs inverted)
m4_variation_gain — spatial-allocation gain vs complexity variation
"""
