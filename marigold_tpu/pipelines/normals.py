class MarigoldNormalsPipeline: pass
class MarigoldNormalsOutput: pass
