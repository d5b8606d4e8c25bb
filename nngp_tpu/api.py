"""Public API (initialize/run/estimate/predict) — filled in as the build
progresses; see nngp_tpu.models.gaussian for the sampler core."""

def initialize(*a, **k):
    raise NotImplementedError

def run(*a, **k):
    raise NotImplementedError

def estimate(*a, **k):
    raise NotImplementedError

def predict_field(*a, **k):
    raise NotImplementedError

def predict_fixed_effects(*a, **k):
    raise NotImplementedError

def save(*a, **k):
    raise NotImplementedError

def load(*a, **k):
    raise NotImplementedError
