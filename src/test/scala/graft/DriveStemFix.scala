package graft

/** Scratch: find which candidate vocab words are Porter-stem fixpoints. */
object DriveStemFix {
  def main(args: Array[String]): Unit = {
    val cand = Seq("run", "walk", "jump", "work", "sort", "fold", "shift",
      "drift", "blend", "clamp", "swim", "crawl", "stand", "sit", "grip",
      "grasp", "climb", "drink", "think", "thank", "long", "strong", "short",
      "flat", "dark", "warm", "cold", "swift", "crisp", "blunt", "sharp",
      "broad", "deep", "wild", "high", "low", "old", "new", "red", "black",
      // spares
      "grim", "bold", "firm", "calm", "slim", "twist", "print", "stamp",
      "brisk", "plain", "proud", "blank", "frost", "spark", "chart", "graph")
    val (fix, non) = cand.partition(w => graft.text.PorterStemmer.stem(w) == w)
    println("FIXPOINTS: " + fix.mkString(" "))
    println("NON: " + non.map(w => s"$w->${graft.text.PorterStemmer.stem(w)}").mkString(" "))
    println(s"n_fix=${fix.size}")
  }
}
