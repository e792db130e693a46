class MarigoldIIDPipeline: pass
class MarigoldIIDOutput: pass
