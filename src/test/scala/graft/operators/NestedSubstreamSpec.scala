package graft.operators

import graft.SparkSpec

class NestedSubstreamSpec extends SparkSpec {
  import spark.implicits._

  test("extractNested double-flattens list-of-list with merged fields (F4)") {
    // budgets -> BudgetLines[] -> BudgetBalances[] (Xero shape)
    val budgets = spark.read.json(Seq(
      """{"BudgetID":"b1","BudgetLines":[
           {"AccountCode":"200","AccountID":"acc200","BudgetBalances":[
             {"Period":"2024-01","Amount":10.0,"Notes":"jan"},
             {"Period":"2024-02","Amount":20.0,"Notes":"feb"}]},
           {"AccountCode":"300","AccountID":"acc300","BudgetBalances":[
             {"Period":"2024-01","Amount":5.0,"Notes":"x"}]}]}""",
      """{"BudgetID":"b2","BudgetLines":[]}""").toDS())
    val out = Substreams.extractNested(budgets, "BudgetID", "BudgetLines",
      "BudgetBalances", keyFields = Seq("AccountCode", "Period"))
    assert(out.count() == 3) // 2 + 1 balances; empty-lines budget drops out
    assert(out.columns.toSet == Set("parent_id", "AccountCode", "AccountID",
      "Period", "Amount", "Notes", "id"))
    val r = out.filter("Period = '2024-02'").head()
    assert(r.getAs[String]("id") == "b1_200_2024-02") // {parent}_{code}_{period}
    assert(r.getAs[String]("AccountID") == "acc200")  // outer fields merged in
    assert(r.getAs[Double]("Amount") == 20.0)         // inner fields merged in
  }
}
