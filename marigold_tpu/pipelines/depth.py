class MarigoldDepthPipeline: pass
class MarigoldDepthOutput: pass
