from .threeway import ThreewayEPE, DYNAMIC_THRESHOLD_M
from .bucketed import BucketedEPE, AV2_CATEGORIES, METACLASSES
