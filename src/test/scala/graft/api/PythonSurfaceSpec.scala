package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** python/graft/__init__.py calls `graft.api.JavaApi` via py4j with exact
  * method names and arities (py4j dispatches reflectively — a rename or
  * arity change breaks Python callers at runtime, not compile time). This
  * spec pins that surface: every (name, paramCount) the wrapper uses must
  * exist on the facade. Update BOTH files together. */
class PythonSurfaceSpec extends AnyFunSuite {

  test("JavaApi exposes every (method, arity) the python wrapper calls") {
    val surface = graft.api.JavaApi.getClass.getMethods
      .map(m => m.getName -> m.getParameterCount).toSet
    val called = Seq(
      "loadAlignments" -> 2, "loadFeatures" -> 2, "loadVariants" -> 2,
      "loadGenotypes" -> 2,
      "markDuplicates" -> 1, "flagStat" -> 1, "countKmers" -> 2,
      "toCoverage" -> 1, "collapseCoverage" -> 1, "binQualities" -> 1,
      "regionJoin" -> 3, "regionJoinFlanked" -> 4,
      "broadcastRegionJoin" -> 3, "overlapCounts" -> 2,
      "exactDuplicates" -> 3, "dropExactDuplicates" -> 3,
      "fingerprints" -> 3, "exactDuplicatesAgainst" -> 4,
      "minhashSignatures" -> 5, "minhashNearDuplicates" -> 7,
      "minhashNearDuplicatesAgainst" -> 8,
      "simhashSignatures" -> 3, "simhashNearDuplicates" -> 4,
      "simhashNearDuplicatesAgainst" -> 5,
      "jaccardSimilarityJoin" -> 5, "clusterDuplicates" -> 1,
      "srpSignatures" -> 2, "lshTopKAgainst" -> 5, "bruteForceTopK" -> 3,
      "lshTopK" -> 5, "ivfTopK" -> 5, "cosineNearDuplicates" -> 4,
      "qualityFilter" -> 3, "langId" -> 2, "redactPii" -> 2,
      "packTokenSpans" -> 5, "extractImageFeatures" -> 1,
      "extractAudioFeatures" -> 3, "imageStats" -> 1, "audioStats" -> 2,
      "videoStats" -> 1, "sampleFrames" -> 2, "stratifiedSample" -> 5,
      "dedupParagraphs" -> 4, "duplicatedParagraphs" -> 4,
      "c4CleanLines" -> 3, "dedupLinesInDoc" -> 3,
      "duplicatedSubstringSpans" -> 4, "removeDuplicatedSubstrings" -> 4,
      "gopherQualityRules" -> 2, "tokenFrequencies" -> 3,
      "extractHtmlText" -> 3, "canonicalizeUrls" -> 3, "urlDedup" -> 3,
      "kmeansFit" -> 5, "kmeansAssign" -> 4, "kmeansCentroidsAsFloat" -> 1,
      "hashSplit" -> 5, "temperatureMix" -> 6, "contaminationReport" -> 7,
      "globalLineDedup" -> 4, "chunkDocuments" -> 5,
      "collocationsPmi" -> 4, "editDistanceNearDuplicates" -> 4,
      "eventTransitions" -> 5, "discPercentiles" -> 5,
      "zOrderWrite" -> 5, "containmentJoin" -> 5,
      "cmsHeavyHitters" -> 5, "hllSummary" -> 3, "bottomKSketch" -> 5,
      "sketchOverlap" -> 2, "coOccurrenceEdges" -> 3, "pageRank" -> 3,
      "pageRankTopK" -> 4, "imageDHash" -> 1, "imageNearDuplicates" -> 3,
      "pcaAxis" -> 3, "pcaLabelProjection" -> 4, "triangleCounts" -> 1,
      "associationRules" -> 5, "linkBreakends" -> 1,
      "bpeMerges" -> 3, "bpeTokenStats" -> 4, "bpeEncodeCounts" -> 4,
      "histogramSketch" -> 6, "histogramPercentiles" -> 6,
      "weightedSample" -> 5, "zScoreOutliers" -> 4,
      "contentDefinedChunks" -> 5, "chunkDedupReport" -> 1,
      "applyNearDedupBy" -> 4, "perceptronTrain" -> 4,
      "breakendEventGroups" -> 1, "audioFingerprint" -> 2,
      "audioNearDuplicates" -> 3, "videoDHash" -> 1,
      "videoNearDuplicates" -> 3, "kCoreByMedianDegree" -> 2,
      "readWarc" -> 2, "warcResponses" -> 1, "warcConversions" -> 1,
      "hammingNearDuplicatesAgainst" -> 6, "hllSummaryByGroup" -> 4,
      "applyNearDedup" -> 3, "correlationMatrix" -> 3,
      "intervalJoin" -> 6,
      "budgetSelect" -> 5, "calibratedSelect" -> 5,
      "nextEventExamples" -> 6, "saltedJoin" -> 6,
      "removeBoilerplate" -> 5, "snapshotDeltaReport" -> 2,
      "globalNtile" -> 4, "keySkewReport" -> 3,
      "sourceNovelty" -> 3, "sourceSimilarity" -> 4,
      "chiSquareFeatures" -> 5, "rrfFuse" -> 6, "giniByGroup" -> 4,
      "kAnonymityReport" -> 3, "trendByGroup" -> 4, "wilsonRanking" -> 4,
      "profileColumns" -> 2, "fkAudit" -> 4, "pkAudit" -> 2,
      "calibrationCurve" -> 5, "rollingDistinctActives" -> 4,
      "volumeAnomalies" -> 7, "retentionCohorts" -> 3,
      "calendarFill" -> 4, "abTestReport" -> 4,
      "eventPathTrigrams" -> 6, "sourceCentroidDrift" -> 3,
      "corpusGrowthCurve" -> 3, "linkDomainEdges" -> 4,
      "topLinkedDomains" -> 2, "rendezvousMoveReport" -> 4,
      "ksDrift" -> 3, "mutualInformationReport" -> 3, "cohenKappa" -> 3,
      "benfordAudit" -> 3, "simplifiedSilhouette" -> 3,
      "cusumChangepoint" -> 4,
      "aucByGroup" -> 4, "entropyByGroup" -> 3, "fleschReadability" -> 3,
      "autocorrByKey" -> 5, "personalizedPageRank" -> 3,
      "personalizedPageRankTopK" -> 4, "hapaxStats" -> 3,
      "rankedEval" -> 5, "targetEncode" -> 4,
      "jsonKeyProfile" -> 2, "momentsByGroup" -> 3,
      "robustScale" -> 4, "skipGramPairs" -> 5,
      "joinSizeProbe" -> 4, "transitionLatency" -> 5,
      "piiCensus" -> 3, "temporalSplitAudit" -> 4,
      "numericProfile" -> 2, "columnDrift" -> 4, "vocabCoverage" -> 3,
      "tstvRatio" -> 4, "hardyWeinberg" -> 3,
      "genotypeConcordance" -> 4, "alleleFrequencySpectrum" -> 4,
      "coverageUniformity" -> 1, "mendelianViolations" -> 4,
      "fleissKappa" -> 3, "bootstrapCi" -> 5, "seasonalProfile" -> 3,
      "kingKinship" -> 5, "inbreedingF" -> 4,
      "substitutionMatrix" -> 3, "indelLengthSpectrum" -> 4,
      "callRate" -> 3, "conformalCoverage" -> 4,
      "confidentLearningGrid" -> 4, "calibrationBins" -> 4,
      "trimmedMeanByGroup" -> 6, "atkinsonIndex" -> 3,
      "madByGroup" -> 4)
    called.foreach { e =>
      assert(surface.contains(e), s"JavaApi missing py4j-called method $e")
    }
  }

  test("the python wrapper source actually names those methods") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("python/graft/__init__.py")), "UTF-8")
    Seq("loadAlignments", "minhashNearDuplicatesAgainst", "lshTopKAgainst",
      "cosineNearDuplicates", "packTokenSpans", "stratifiedSample",
      "extractAudioFeatures", "cmsHeavyHitters", "hllSummary",
      "pageRankTopK", "sketchOverlap").foreach { m =>
      assert(src.contains(m), s"python wrapper no longer calls $m")
    }
  }
}
