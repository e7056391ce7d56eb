from .schedule import SamplingSchedule, get_schedule
from .sampler import SampleParams, edm_sample
